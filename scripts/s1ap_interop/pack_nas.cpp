// Ground truth: pack NAS messages with known values using the REFERENCE's
// liblte_mme codec; output "name hex" per line.  The hex is pinned as
// golden decode vectors in tests/test_nas_codec_full.py.
#include "srslte/asn1/liblte_mme.h"
#include <cstdio>
#include <cstring>

static void emit(const char* name, LIBLTE_BYTE_MSG_STRUCT* m) {
  printf("%s ", name);
  for (uint32_t i = 0; i < m->N_bytes; ++i) printf("%02x", m->msg[i]);
  printf("\n");
}

int main() {
  LIBLTE_BYTE_MSG_STRUCT out;

  {
    LIBLTE_MME_AUTHENTICATION_REQUEST_MSG_STRUCT m;
    memset(&m, 0, sizeof m);
    m.nas_ksi.tsc_flag = LIBLTE_MME_TYPE_OF_SECURITY_CONTEXT_FLAG_NATIVE;
    m.nas_ksi.nas_ksi = 2;
    for (int i = 0; i < 16; ++i) { m.rand[i] = i; m.autn[i] = 100 + i; }
    liblte_mme_pack_authentication_request_msg(&m, &out);
    emit("authentication_request", &out);
  }
  {
    LIBLTE_MME_AUTHENTICATION_REJECT_MSG_STRUCT m;
    liblte_mme_pack_authentication_reject_msg(&m, &out);
    emit("authentication_reject", &out);
  }
  {
    LIBLTE_MME_ID_REQUEST_MSG_STRUCT m;
    m.id_type = LIBLTE_MME_ID_TYPE_2_IMSI;
    liblte_mme_pack_identity_request_msg(&m, &out);
    emit("identity_request", &out);
  }
  {
    LIBLTE_MME_SECURITY_MODE_COMMAND_MSG_STRUCT m;
    memset(&m, 0, sizeof m);
    m.selected_nas_sec_algs.type_of_eea = LIBLTE_MME_TYPE_OF_CIPHERING_ALGORITHM_128_EEA2;
    m.selected_nas_sec_algs.type_of_eia = LIBLTE_MME_TYPE_OF_INTEGRITY_ALGORITHM_128_EIA2;
    m.nas_ksi.tsc_flag = LIBLTE_MME_TYPE_OF_SECURITY_CONTEXT_FLAG_NATIVE;
    m.nas_ksi.nas_ksi = 0;
    m.ue_security_cap.eea[0] = m.ue_security_cap.eea[1] = m.ue_security_cap.eea[2] = true;
    m.ue_security_cap.eia[1] = m.ue_security_cap.eia[2] = true;
    m.ue_security_cap.uea_present = false;
    m.ue_security_cap.uia_present = false;
    m.ue_security_cap.gea_present = false;
    m.imeisv_req_present = true;
    m.imeisv_req = LIBLTE_MME_IMEISV_REQUESTED;
    m.nonce_ue_present = false;
    m.nonce_mme_present = false;
    liblte_mme_pack_security_mode_command_msg(&m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out);
    emit("security_mode_command", &out);
  }
  {
    LIBLTE_MME_DETACH_REQUEST_MSG_STRUCT m;
    memset(&m, 0, sizeof m);
    m.detach_type.switch_off = LIBLTE_MME_SO_FLAG_NORMAL_DETACH;
    m.detach_type.type_of_detach = LIBLTE_MME_TOD_UL_EPS_DETACH;
    m.nas_ksi.tsc_flag = LIBLTE_MME_TYPE_OF_SECURITY_CONTEXT_FLAG_NATIVE;
    m.nas_ksi.nas_ksi = 1;
    m.eps_mobile_id.type_of_id = LIBLTE_MME_EPS_MOBILE_ID_TYPE_GUTI;
    m.eps_mobile_id.guti.mcc = 1;
    m.eps_mobile_id.guti.mnc = 1;
    m.eps_mobile_id.guti.mme_group_id = 0x1234;
    m.eps_mobile_id.guti.mme_code = 0x1a;
    m.eps_mobile_id.guti.m_tmsi = 0xdeadbeef;
    liblte_mme_pack_detach_request_msg(&m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out);
    emit("detach_request", &out);
  }
  {
    LIBLTE_MME_SERVICE_REJECT_MSG_STRUCT m;
    memset(&m, 0, sizeof m);
    m.emm_cause = 0x27;  // congestion? (#39 CS domain unavailable)
    m.t3442_present = true;
    m.t3442.unit = LIBLTE_MME_GPRS_TIMER_UNIT_1_MINUTE;
    m.t3442.value = 5;
    m.t3446_present = false;
    liblte_mme_pack_service_reject_msg(&m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out);
    emit("service_reject", &out);
  }
  {
    LIBLTE_MME_GUTI_REALLOCATION_COMMAND_MSG_STRUCT m;
    memset(&m, 0, sizeof m);
    m.guti.type_of_id = LIBLTE_MME_EPS_MOBILE_ID_TYPE_GUTI;
    m.guti.guti.mcc = 1;
    m.guti.guti.mnc = 1;
    m.guti.guti.mme_group_id = 2;
    m.guti.guti.mme_code = 3;
    m.guti.guti.m_tmsi = 0x01020304;
    m.tai_list_present = false;
    liblte_mme_pack_guti_reallocation_command_msg(&m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out);
    emit("guti_reallocation_command", &out);
  }
  {
    LIBLTE_MME_EMM_INFORMATION_MSG_STRUCT m;
    memset(&m, 0, sizeof m);
    m.full_net_name_present = true;
    strcpy(m.full_net_name.name, "srsLTE");
    m.full_net_name.add_ci = LIBLTE_MME_ADD_CI_DONT_ADD;
    m.short_net_name_present = true;
    strcpy(m.short_net_name.name, "srs");
    m.short_net_name.add_ci = LIBLTE_MME_ADD_CI_DONT_ADD;
    m.local_time_zone_present = false;
    m.utc_and_local_time_zone_present = false;
    m.net_dst_present = false;
    liblte_mme_pack_emm_information_msg(&m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out);
    emit("emm_information", &out);
  }
  {
    LIBLTE_MME_PDN_CONNECTIVITY_REQUEST_MSG_STRUCT m;
    memset(&m, 0, sizeof m);
    m.eps_bearer_id = 0;
    m.proc_transaction_id = 1;
    m.pdn_type = LIBLTE_MME_PDN_TYPE_IPV4;
    m.request_type = LIBLTE_MME_REQUEST_TYPE_INITIAL_REQUEST;
    m.esm_info_transfer_flag_present = true;
    m.esm_info_transfer_flag = LIBLTE_MME_ESM_INFO_TRANSFER_FLAG_REQUIRED;
    m.apn_present = false;
    m.protocol_cnfg_opts_present = false;
    m.device_properties_present = false;
    liblte_mme_pack_pdn_connectivity_request_msg(&m, &out);
    emit("pdn_connectivity_request", &out);
  }
  {
    LIBLTE_MME_ESM_INFORMATION_RESPONSE_MSG_STRUCT m;
    memset(&m, 0, sizeof m);
    m.eps_bearer_id = 0;
    m.proc_transaction_id = 1;
    m.apn_present = true;
    strcpy(m.apn.apn, "internet");
    m.protocol_cnfg_opts_present = false;
    liblte_mme_pack_esm_information_response_msg(&m, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out);
    emit("esm_information_response", &out);
  }
  return 0;
}
