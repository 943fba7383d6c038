"""Cross-codec proof of the LIVE RRC wire.

Every hex vector below was produced by `stack/rrc_wire.py`'s channel
encoders and round-tripped BYTE-EXACT through the reference's generated
36.331 codec (`rrc_asn1.cc` unpack + repack identity, via
`scripts/s1ap_interop/unpack_rrc.cpp` + `gen_rrc_live.py`, verified
2026-08-18 — 21/21, zero mismatches).  This test pins both directions
without needing the C++ toolchain: our encoders must reproduce the
pinned bytes exactly, and our decoders must parse them back.
"""

import pytest

from srslte_emane_tpu.stack import rrc_msgs, rrc_wire

VECTORS = [
    ("ul_ccch", "conn_request_stmsi", "401012345678"),
    ("ul_ccch", "conn_request_random", "50ab54a98c58"),
    ("ul_ccch", "reest_request", "08e220000008"),
    ("dl_ccch", "conn_setup", "60101b"),
    ("dl_ccch", "conn_reject", "4020"),
    ("pcch", "paging_cs", "4000100000bcd8"),
    ("bcch_dl_sch", "sib1", "4040040300010019b0181400005000"),
    ("bcch_dl_sch", "sib2", "00000c61bf6c8000d611e0004000080002994596805c000e"),
    ("bcch_dl_sch", "sib3", "000420200a48"),
    ("ul_dcch", "setup_complete", "2000080e820204"),
    ("ul_dcch", "smc_complete", "2800"),
    ("ul_dcch", "recfg_complete", "1000"),
    ("ul_dcch", "ul_info_transfer", "480064e00020"),
    ("ul_dcch", "meas_report", "0810324c01952d"),
    ("ul_dcch", "ue_cap_info", "380100b81800001c000f3020e00000"),
    ("dl_dcch", "smc", "300220"),
    ("dl_dcch", "dl_info_transfer", "0800903a9000000000000000000000000000000000"),
    ("dl_dcch", "cap_enquiry", "380000"),
    ("dl_dcch", "release_redirect", "2824301000"),
    ("dl_dcch", "recfg_full", "20169500000000005200028005787000000020742240b280111d9c018c10a100004a1000800040"),
    ("dl_dcch", "recfg_mobility", "20090666d6968000000040068000"),
]


MESSAGES = {
    "conn_request_stmsi": ("ul_ccch", rrc_msgs.RrcConnectionRequest(
        ue_identity=0x1234567, is_s_tmsi=True)),
    "conn_request_random": ("ul_ccch", rrc_msgs.RrcConnectionRequest(
        ue_identity=0xAB54A98C5)),
    "reest_request": ("ul_ccch",
                      rrc_msgs.RrcConnectionReestablishmentRequest(
                          c_rnti=0x4711)),
    "conn_setup": ("dl_ccch", rrc_msgs.RrcConnectionSetup()),
    "conn_reject": ("dl_ccch", rrc_msgs.RrcConnectionReject(wait_time_s=2)),
    "paging_cs": ("pcch", rrc_msgs.Paging(ue_identity=3021,
                                          cn_domain="cs")),
    "sib1": ("bcch_dl_sch", rrc_msgs.Sib1()),
    "sib2": ("bcch_dl_sch", rrc_msgs.Sib2()),
    "sib3": ("bcch_dl_sch", rrc_msgs.Sib3()),
    "setup_complete": ("ul_dcch", rrc_msgs.RrcConnectionSetupComplete(
        nas_pdu=b"\x07\x41\x01\x02")),
    "smc_complete": ("ul_dcch", rrc_msgs.SecurityModeComplete()),
    "recfg_complete": ("ul_dcch",
                       rrc_msgs.RrcConnectionReconfigurationComplete()),
    "ul_info_transfer": ("ul_dcch", rrc_msgs.UlInformationTransfer(
        nas_pdu=b"\x27\x00\x01")),
    "meas_report": ("ul_dcch", rrc_msgs.MeasurementReport(
        rsrp_dbm=-90.0, rsrq_db=-10.0, neigh=[(101, -95.0)])),
    "ue_cap_info": ("ul_dcch", rrc_msgs.UECapabilityInformation(
        category=4)),
    "smc": ("dl_dcch", rrc_msgs.SecurityModeCommand(ciph_algo=2,
                                                    int_algo=2)),
    "dl_info_transfer": ("dl_dcch", rrc_msgs.DlInformationTransfer(
        nas_pdu=b"\x07\x52" + bytes(16))),
    "cap_enquiry": ("dl_dcch", rrc_msgs.UECapabilityEnquiry()),
    "release_redirect": ("dl_dcch", rrc_msgs.RrcConnectionRelease(
        cause="cs-FallbackHighPriority", redirect_rat="geran",
        redirect_arfcn=514)),
    "recfg_full": ("dl_dcch", rrc_msgs.RrcConnectionReconfiguration(
        drbs_to_add=[rrc_msgs.DrbToAdd(drb_id=1, lcid=3,
                                       eps_bearer_id=5)],
        nas_pdu=b"\x07\x42",
        scells_to_add=[rrc_msgs.ScellToAdd(scell_idx=1, pci=2, earfcn=1)],
        meas_config=rrc_msgs.MeasConfig(),
        sps_config=rrc_msgs.SpsConfig(sps_crnti=0x3042,
                                      interval_dl=20))),
    "recfg_mobility": ("dl_dcch", rrc_msgs.RrcConnectionReconfiguration(
        mobility=rrc_msgs.MobilityControlInfo(
            target_pci=307, new_rnti=0x5A5A, dedicated_preamble=52))),
}

_ENC = dict(ul_ccch=rrc_wire.encode_ul_ccch, dl_ccch=rrc_wire.encode_dl_ccch,
            pcch=rrc_wire.encode_pcch, bcch_dl_sch=rrc_wire.encode_bcch,
            ul_dcch=rrc_wire.encode_ul_dcch,
            dl_dcch=rrc_wire.encode_dl_dcch)
_DEC = dict(ul_ccch=rrc_wire.decode_ul_ccch, dl_ccch=rrc_wire.decode_dl_ccch,
            pcch=rrc_wire.decode_pcch, bcch_dl_sch=rrc_wire.decode_bcch,
            ul_dcch=rrc_wire.decode_ul_dcch,
            dl_dcch=rrc_wire.decode_dl_dcch)


@pytest.mark.parametrize("chan,name,hexstr", VECTORS,
                         ids=[v[1] for v in VECTORS])
def test_live_wire_bytes_are_reference_exact(chan, name, hexstr):
    chan2, msg = MESSAGES[name]
    assert chan2 == chan
    assert _ENC[chan](msg).hex() == hexstr
    _DEC[chan](bytes.fromhex(hexstr))  # and they parse back
