// Ground truth: pack a Paging with known field values using liblte itself.
#include "srslte/asn1/liblte_s1ap.h"
#include <cstdio>
#include <cstring>

int main() {
  LIBLTE_S1AP_S1AP_PDU_STRUCT pdu;
  memset(&pdu, 0, sizeof pdu);
  pdu.choice_type = LIBLTE_S1AP_S1AP_PDU_CHOICE_INITIATINGMESSAGE;
  pdu.choice.initiatingMessage.procedureCode = LIBLTE_S1AP_PROC_ID_PAGING;
  pdu.choice.initiatingMessage.criticality = LIBLTE_S1AP_CRITICALITY_IGNORE;
  pdu.choice.initiatingMessage.choice_type =
      LIBLTE_S1AP_INITIATINGMESSAGE_CHOICE_PAGING;
  LIBLTE_S1AP_MESSAGE_PAGING_STRUCT* m = &pdu.choice.initiatingMessage.choice.Paging;
  m->ext = false;
  // UEIdentityIndexValue: 10-bit 0x2BB
  for (int i = 0; i < 10; ++i)
    m->UEIdentityIndexValue.buffer[i] = (0x2BB >> (9 - i)) & 1;
  m->UEPagingID.ext = false;
  m->UEPagingID.choice_type = LIBLTE_S1AP_UEPAGINGID_CHOICE_S_TMSI;
  m->UEPagingID.choice.s_TMSI.ext = false;
  m->UEPagingID.choice.s_TMSI.iE_Extensions_present = false;
  m->UEPagingID.choice.s_TMSI.mMEC.buffer[0] = 0x1a;
  uint8_t tmsi[4] = {0xde, 0xad, 0xbe, 0xef};
  memcpy(m->UEPagingID.choice.s_TMSI.m_TMSI.buffer, tmsi, 4);
  m->pagingDRX_present = false;
  m->CNDomain = LIBLTE_S1AP_CNDOMAIN_PS;
  m->TAIList.len = 1;
  m->TAIList.buffer[0].ext = false;
  m->TAIList.buffer[0].iE_Extensions_present = false;
  uint8_t plmn[3] = {0x00, 0xf1, 0x10};
  memcpy(m->TAIList.buffer[0].tAI.pLMNidentity.buffer, plmn, 3);
  m->TAIList.buffer[0].tAI.ext = false;
  m->TAIList.buffer[0].tAI.iE_Extensions_present = false;
  uint8_t tac[2] = {0x00, 0x07};
  memcpy(m->TAIList.buffer[0].tAI.tAC.buffer, tac, 2);
  m->CSG_IdList_present = false;
  m->PagingPriority_present = false;
  LIBLTE_BYTE_MSG_STRUCT out;
  if (liblte_s1ap_pack_s1ap_pdu(&pdu, &out) != LIBLTE_SUCCESS) {
    printf("ERR pack\n");
    return 1;
  }
  for (uint32_t i = 0; i < out.N_bytes; ++i) printf("%02x", out.msg[i]);
  printf("\n");
  return 0;
}
