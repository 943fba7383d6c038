// Interop harness: decode hex S1AP PDUs from stdin with the reference's
// generated liblte_s1ap codec; print the recognized message type and key
// fields so the python side can assert cross-codec agreement.
#include "srslte/asn1/liblte_s1ap.h"
#include <cstdio>
#include <cstring>
#include <string>

static int unhex(const char* s, uint8_t* out) {
  int n = 0;
  while (s[0] && s[1] && s[0] != '\n') {
    unsigned v;
    sscanf(s, "%2x", &v);
    out[n++] = (uint8_t)v;
    s += 2;
  }
  return n;
}

int main() {
  char line[16384];
  while (fgets(line, sizeof line, stdin)) {
    LIBLTE_BYTE_MSG_STRUCT msg;
    msg.N_bytes = unhex(line, msg.msg);
    LIBLTE_S1AP_S1AP_PDU_STRUCT pdu;
    if (liblte_s1ap_unpack_s1ap_pdu(&msg, &pdu) != LIBLTE_SUCCESS) {
      printf("ERR unpack\n");
      fflush(stdout);
      continue;
    }
    LIBLTE_BYTE_MSG_STRUCT repacked;
    if (liblte_s1ap_pack_s1ap_pdu(&pdu, &repacked) == LIBLTE_SUCCESS) {
      printf("REPACK ");
      for (uint32_t i = 0; i < repacked.N_bytes; ++i) printf("%02x", repacked.msg[i]);
      printf("\n");
    }
    if (pdu.choice_type == LIBLTE_S1AP_S1AP_PDU_CHOICE_INITIATINGMESSAGE) {
      LIBLTE_S1AP_INITIATINGMESSAGE_STRUCT* im = &pdu.choice.initiatingMessage;
      printf("OK init proc=%u choice=%u", im->procedureCode, im->choice_type);
      if (im->choice_type == LIBLTE_S1AP_INITIATINGMESSAGE_CHOICE_INITIALUEMESSAGE) {
        LIBLTE_S1AP_MESSAGE_INITIALUEMESSAGE_STRUCT* m = &im->choice.InitialUEMessage;
        printf(" enb_ue_id=%u nas_len=%u cause=%d tac=%02x%02x",
               m->eNB_UE_S1AP_ID.ENB_UE_S1AP_ID, m->NAS_PDU.n_octets,
               (int)m->RRC_Establishment_Cause.e,
               m->TAI.tAC.buffer[0], m->TAI.tAC.buffer[1]);
      } else if (im->choice_type == LIBLTE_S1AP_INITIATINGMESSAGE_CHOICE_DOWNLINKNASTRANSPORT) {
        LIBLTE_S1AP_MESSAGE_DOWNLINKNASTRANSPORT_STRUCT* m = &im->choice.DownlinkNASTransport;
        printf(" mme_ue_id=%u enb_ue_id=%u nas_len=%u",
               m->MME_UE_S1AP_ID.MME_UE_S1AP_ID,
               m->eNB_UE_S1AP_ID.ENB_UE_S1AP_ID, m->NAS_PDU.n_octets);
      } else if (im->choice_type == LIBLTE_S1AP_INITIATINGMESSAGE_CHOICE_UPLINKNASTRANSPORT) {
        LIBLTE_S1AP_MESSAGE_UPLINKNASTRANSPORT_STRUCT* m = &im->choice.UplinkNASTransport;
        printf(" mme_ue_id=%u enb_ue_id=%u nas_len=%u",
               m->MME_UE_S1AP_ID.MME_UE_S1AP_ID,
               m->eNB_UE_S1AP_ID.ENB_UE_S1AP_ID, m->NAS_PDU.n_octets);
      } else if (im->choice_type == LIBLTE_S1AP_INITIATINGMESSAGE_CHOICE_UECONTEXTRELEASECOMMAND) {
        LIBLTE_S1AP_MESSAGE_UECONTEXTRELEASECOMMAND_STRUCT* m = &im->choice.UEContextReleaseCommand;
        if (m->UE_S1AP_IDs.choice_type == LIBLTE_S1AP_UE_S1AP_IDS_CHOICE_UE_S1AP_ID_PAIR)
          printf(" mme_ue_id=%u enb_ue_id=%u",
                 m->UE_S1AP_IDs.choice.uE_S1AP_ID_pair.mME_UE_S1AP_ID.MME_UE_S1AP_ID,
                 m->UE_S1AP_IDs.choice.uE_S1AP_ID_pair.eNB_UE_S1AP_ID.ENB_UE_S1AP_ID);
      } else if (im->choice_type == LIBLTE_S1AP_INITIATINGMESSAGE_CHOICE_PAGING) {
        LIBLTE_S1AP_MESSAGE_PAGING_STRUCT* m = &im->choice.Paging;
        printf(" paging_choice=%u cn=%d", m->UEPagingID.choice_type,
               (int)m->CNDomain);
      }
      printf("\n");
    } else {
      printf("OK type=%u proc=%u\n", pdu.choice_type,
             pdu.choice_type == LIBLTE_S1AP_S1AP_PDU_CHOICE_SUCCESSFULOUTCOME
                 ? pdu.choice.successfulOutcome.procedureCode : 0);
    }
    fflush(stdout);
  }
  return 0;
}
