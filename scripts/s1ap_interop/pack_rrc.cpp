// Ground truth: pack RRC messages with the reference's generated 36.331
// codec (rrc_asn1.cc); print "name hex" lines for golden-vector pinning.
#include "srslte/asn1/rrc_asn1.h"
#include <cstdio>\n#include <cstring>

using namespace asn1;
using namespace asn1::rrc;

static void emit(const char* name, const uint8_t* buf, int nbytes) {
  printf("%s ", name);
  for (int i = 0; i < nbytes; ++i) printf("%02x", buf[i]);
  printf("\n");
}

int main() {
  uint8_t buf[512];

  {  // RRC Connection Reject with wait time
    dl_ccch_msg_s m;
    m.msg.set(dl_ccch_msg_type_c::types::c1);
    m.msg.c1().set(dl_ccch_msg_type_c::c1_c_::types::rrc_conn_reject);
    rrc_conn_reject_s& r = m.msg.c1().rrc_conn_reject();
    r.crit_exts.set(rrc_conn_reject_s::crit_exts_c_::types::c1);
    r.crit_exts.c1().set(
        rrc_conn_reject_s::crit_exts_c_::c1_c_::types::rrc_conn_reject_r8);
    r.crit_exts.c1().rrc_conn_reject_r8().wait_time = 10;
    bit_ref b(buf, sizeof buf);
    m.pack(b);
    emit("rrc_conn_reject", buf, (b.distance() + 7) / 8);
  }
  {  // RRC Connection Release with redirection
    dl_dcch_msg_s m;
    m.msg.set(dl_dcch_msg_type_c::types::c1);
    m.msg.c1().set(dl_dcch_msg_type_c::c1_c_::types::rrc_conn_release);
    rrc_conn_release_s& r = m.msg.c1().rrc_conn_release();
    r.rrc_transaction_id = 2;
    r.crit_exts.set(rrc_conn_release_s::crit_exts_c_::types::c1);
    r.crit_exts.c1().set(
        rrc_conn_release_s::crit_exts_c_::c1_c_::types::rrc_conn_release_r8);
    rrc_conn_release_r8_ies_s& r8 = r.crit_exts.c1().rrc_conn_release_r8();
    r8.release_cause = release_cause_e::other;
    bit_ref b(buf, sizeof buf);
    m.pack(b);
    emit("rrc_conn_release", buf, (b.distance() + 7) / 8);
  }
  {  // UE Capability Enquiry
    dl_dcch_msg_s m;
    m.msg.set(dl_dcch_msg_type_c::types::c1);
    m.msg.c1().set(dl_dcch_msg_type_c::c1_c_::types::ue_cap_enquiry);
    ue_cap_enquiry_s& r = m.msg.c1().ue_cap_enquiry();
    r.rrc_transaction_id = 1;
    r.crit_exts.set(ue_cap_enquiry_s::crit_exts_c_::types::c1);
    r.crit_exts.c1().set(
        ue_cap_enquiry_s::crit_exts_c_::c1_c_::types::ue_cap_enquiry_r8);
    r.crit_exts.c1().ue_cap_enquiry_r8().ue_cap_request.resize(1);
    r.crit_exts.c1().ue_cap_enquiry_r8().ue_cap_request[0] =
        rat_type_e::eutra;
    bit_ref b(buf, sizeof buf);
    m.pack(b);
    emit("ue_capability_enquiry", buf, (b.distance() + 7) / 8);
  }
  {  // Security Mode Command (EEA2/EIA2)
    dl_dcch_msg_s m;
    m.msg.set(dl_dcch_msg_type_c::types::c1);
    m.msg.c1().set(dl_dcch_msg_type_c::c1_c_::types::security_mode_cmd);
    security_mode_cmd_s& r = m.msg.c1().security_mode_cmd();
    r.rrc_transaction_id = 0;
    r.crit_exts.set(security_mode_cmd_s::crit_exts_c_::types::c1);
    r.crit_exts.c1().set(
        security_mode_cmd_s::crit_exts_c_::c1_c_::types::security_mode_cmd_r8);
    security_mode_cmd_r8_ies_s& r8 = r.crit_exts.c1().security_mode_cmd_r8();
    r8.security_cfg_smc.security_algorithm_cfg.ciphering_algorithm =
        ciphering_algorithm_r12_e::eea2;
    r8.security_cfg_smc.security_algorithm_cfg.integrity_prot_algorithm =
        security_algorithm_cfg_s::integrity_prot_algorithm_e_::eia2;
    bit_ref b(buf, sizeof buf);
    m.pack(b);
    emit("security_mode_command", buf, (b.distance() + 7) / 8);
  }
  {  // Paging with one record (s-TMSI) + systemInfoModification
    pcch_msg_s m;
    m.msg.set(pcch_msg_type_c::types::c1);
    paging_s& p = m.msg.c1().paging();
    p.paging_record_list_present = true;
    p.paging_record_list.resize(1);
    p.paging_record_list[0].ue_id.set(paging_ue_id_c::types::s_tmsi);
    p.paging_record_list[0].ue_id.s_tmsi().mmec.from_number(0x1a);
    p.paging_record_list[0].ue_id.s_tmsi().m_tmsi.from_number(0xdeadbeef);
    p.paging_record_list[0].cn_domain = paging_record_s::cn_domain_e_::ps;
    p.sys_info_mod_present = true;
    bit_ref b(buf, sizeof buf);
    m.pack(b);
    emit("paging_stmsi", buf, (b.distance() + 7) / 8);
  }
  {  // DL Information Transfer carrying a NAS PDU
    dl_dcch_msg_s m;
    m.msg.set(dl_dcch_msg_type_c::types::c1);
    m.msg.c1().set(dl_dcch_msg_type_c::c1_c_::types::dl_info_transfer);
    dl_info_transfer_s& r = m.msg.c1().dl_info_transfer();
    r.rrc_transaction_id = 3;
    r.crit_exts.set(dl_info_transfer_s::crit_exts_c_::types::c1);
    r.crit_exts.c1().set(
        dl_info_transfer_s::crit_exts_c_::c1_c_::types::dl_info_transfer_r8);
    dl_info_transfer_r8_ies_s& r8 = r.crit_exts.c1().dl_info_transfer_r8();
    r8.ded_info_type.set(
        dl_info_transfer_r8_ies_s::ded_info_type_c_::types::ded_info_nas);
    uint8_t nas[5] = {0x07, 0x55, 0x01, 0xab, 0xcd};
    r8.ded_info_type.ded_info_nas().resize(5);
    memcpy(r8.ded_info_type.ded_info_nas().data(), nas, 5);
    bit_ref b(buf, sizeof buf);
    m.pack(b);
    emit("dl_info_transfer", buf, (b.distance() + 7) / 8);
  }
  return 0;
}
