"""The live RRC SRB wire carries true 36.331 UPER bytes (stack/rrc_wire).

Every RRC dataclass the stacks exchange must round-trip through real
36.331 encoding on its logical channel — the same schema runtime the
codec interop tests prove byte-exact against the reference's
rrc_asn1_test.cc vectors — and the bytes must independently re-parse
through the channel's message schema.
"""

import pytest

from srslte_emane_tpu.stack import rrc_msgs, rrc_wire
from srslte_emane_tpu.stack.asn1 import rrc36331 as r
from srslte_emane_tpu.stack.asn1.runtime import BitReader


def _parse(typ, data):
    return typ.dec(BitReader(bytes(data)))


UL_CCCH = [
    rrc_msgs.RrcConnectionRequest(ue_identity=0x1234567, is_s_tmsi=True,
                                  cause="mo-Data"),
    rrc_msgs.RrcConnectionRequest(ue_identity=0xAB54A98C5, is_s_tmsi=False,
                                  cause="mo-Signalling"),
    rrc_msgs.RrcConnectionReestablishmentRequest(c_rnti=0x4711,
                                                 cause="otherFailure"),
]

UL_DCCH = [
    rrc_msgs.RrcConnectionSetupComplete(selected_plmn=1,
                                        nas_pdu=b"\x07\x41" + bytes(20)),
    rrc_msgs.SecurityModeComplete(),
    rrc_msgs.RrcConnectionReconfigurationComplete(),
    rrc_msgs.UlInformationTransfer(nas_pdu=b"\x27" + bytes(12)),
    rrc_msgs.MeasurementReport(rsrp_dbm=-90.0, rsrq_db=-10.0,
                               neigh=[(101, -95.0), (205, -99.0)]),
    rrc_msgs.UECapabilityInformation(category=5, supports_64qam_ul=True),
]

DL_DCCH = [
    rrc_msgs.SecurityModeCommand(ciph_algo=2, int_algo=2),
    rrc_msgs.DlInformationTransfer(nas_pdu=b"\x07\x52" + bytes(32)),
    rrc_msgs.UECapabilityEnquiry(rat_types=("eutra",)),
    rrc_msgs.RrcConnectionRelease(cause="other"),
    rrc_msgs.RrcConnectionRelease(cause="cs-FallbackHighPriority",
                                  redirect_rat="geran",
                                  redirect_arfcn=514),
    rrc_msgs.RrcConnectionReconfiguration(nas_pdu=b"\x07\x42" + bytes(8)),
    rrc_msgs.RrcConnectionReconfiguration(
        drbs_to_add=[rrc_msgs.DrbToAdd(drb_id=1, lcid=3, eps_bearer_id=5)],
        nas_pdu=b"\x07\x42",
        scells_to_add=[rrc_msgs.ScellToAdd(scell_idx=1, pci=2, earfcn=1)],
        meas_config=rrc_msgs.MeasConfig(a3_offset_db=3.0,
                                        hysteresis_db=1.0,
                                        time_to_trigger=3,
                                        report_interval=120),
        sps_config=rrc_msgs.SpsConfig(sps_crnti=0x3042, interval_dl=20)),
    rrc_msgs.RrcConnectionReconfiguration(
        mobility=rrc_msgs.MobilityControlInfo(
            target_pci=307, new_rnti=0x5A5A, dedicated_preamble=52,
            key_change="x2")),
]


@pytest.mark.parametrize("msg", UL_CCCH, ids=lambda m: type(m).__name__)
def test_ul_ccch_roundtrip(msg):
    data = rrc_wire.encode_ul_ccch(msg)
    _parse(r.UL_CCCH_MSG, data)  # independent schema parse
    assert rrc_wire.decode_ul_ccch(data) == msg


@pytest.mark.parametrize("msg", UL_DCCH, ids=lambda m: type(m).__name__)
def test_ul_dcch_roundtrip(msg):
    data = rrc_wire.encode_ul_dcch(msg)
    _parse(r.UL_DCCH_MSG, data)
    assert rrc_wire.decode_ul_dcch(data) == msg


@pytest.mark.parametrize("msg", DL_DCCH, ids=lambda m: type(m).__name__)
def test_dl_dcch_roundtrip(msg):
    data = rrc_wire.encode_dl_dcch(msg)
    _parse(r.DL_DCCH_MSG, data)
    assert rrc_wire.decode_dl_dcch(data) == msg


def test_dl_ccch_setup_and_pcch():
    data = rrc_wire.encode_dl_ccch(rrc_msgs.RrcConnectionSetup())
    tree = _parse(r.DL_CCCH_MSG, data)
    _c1, (name, val) = tree["msg"]
    assert name == "rrc_conn_setup"
    # srb1 configured with default RLC/logical-channel configs
    _c1b, (_r8, body) = val["crit_exts"]
    srbs = body["rr_cfg_ded"]["srb_to_add_mod_list"]
    assert srbs[0]["srb_id"] == 1
    assert rrc_wire.decode_dl_ccch(data) == rrc_msgs.RrcConnectionSetup()

    page = rrc_msgs.Paging(ue_identity=3021, cn_domain="cs")
    data = rrc_wire.encode_pcch(page)
    tree = _parse(r.PCCH_MSG, data)
    assert rrc_wire.decode_pcch(data) == page


def test_bcch_sibs_roundtrip():
    """SIB1 and SIB2 broadcast as real BCCH-DL-SCH messages (cell access
    info + full radioResourceConfigCommonSIB), round-tripping the fields
    the emulation consumes."""
    s1 = rrc_msgs.Sib1(plmn=1, tac=7, cell_identity=0x19B01,
                       q_rx_lev_min_dbm=-130.0, si_window_ms=20)
    data = rrc_wire.encode_bcch(s1)
    tree = _parse(r.BCCH_DL_SCH_MSG, data)
    _c1, (name, _v) = tree["msg"]
    assert name == "sib_type1"
    assert rrc_wire.decode_bcch(data) == s1

    s2 = rrc_msgs.Sib2(n_preambles=52, ra_response_window=10,
                       mac_con_res_timer=64, prach_config_index=3,
                       prach_freq_offset=4)
    data = rrc_wire.encode_bcch(s2)
    tree = _parse(r.BCCH_DL_SCH_MSG, data)
    _c1, (name, _v) = tree["msg"]
    assert name == "sys_info"
    assert rrc_wire.decode_bcch(data) == s2


def test_sib3_reselection_parameters():
    """SIB3 broadcasts real cell-reselection parameters (Qhyst,
    TreselectionEUTRA) as a BCCH SystemInformation message."""
    s3 = rrc_msgs.Sib3(q_hyst_db=6, t_resel_s=2)
    data = rrc_wire.encode_bcch(s3)
    tree = _parse(r.BCCH_DL_SCH_MSG, data)
    _c1, (name, _v) = tree["msg"]
    assert name == "sys_info"
    assert rrc_wire.decode_bcch(data) == s3
    # off-grid Qhyst snaps to the 36.331 enumeration (no db7)
    out = rrc_wire.decode_bcch(rrc_wire.encode_bcch(
        rrc_msgs.Sib3(q_hyst_db=7)))
    assert out.q_hyst_db in (6, 8)


def test_ue_capability_nested_container():
    """UECapabilityInformation carries a genuine standalone-UPER
    UE-EUTRA-Capability in its rat-container octet string (the structure
    rrc_asn1_test.cc's rrc_ue_cap_info_test builds), and the category is
    read back from INSIDE the container."""
    data = rrc_wire.encode_ul_dcch(rrc_msgs.UECapabilityInformation(
        category=4, supports_64qam_ul=False))
    tree = _parse(r.UL_DCCH_MSG, data)
    _c1, (name, val) = tree["msg"]
    assert name == "ue_cap_info"
    _c1b, (_r8, body) = val["crit_exts"]
    item = body["ue_cap_rat_container_list"][0]
    assert item["rat_type"] == "eutra"
    cap = r.UE_EUTRA_CAPABILITY.dec(
        __import__("srslte_emane_tpu.stack.asn1.runtime",
                   fromlist=["BitReader"]).BitReader(
            item["ue_cap_rat_container"]))
    assert cap["ue_category"] == 4
    assert cap["access_stratum_release"] == "rel8"
    assert len(cap["feature_group_inds"]) == 32
    out = rrc_wire.decode_ul_dcch(data)
    assert out.category == 4 and out.supports_64qam_ul is False


def test_meas_report_quantizes_to_spec_ranges():
    """RSRP/RSRQ ride the 36.133 integer ranges: values snap to 1 dB /
    0.5 dB steps like the reference's measurement reports."""
    m = rrc_msgs.MeasurementReport(rsrp_dbm=-90.4, rsrq_db=-10.3,
                                   neigh=[(7, -101.6)])
    out = rrc_wire.decode_ul_dcch(rrc_wire.encode_ul_dcch(m))
    assert out.rsrp_dbm == -90.0
    assert abs(out.rsrq_db - -10.5) < 1e-9
    assert out.neigh == [(7, -102.0)]
