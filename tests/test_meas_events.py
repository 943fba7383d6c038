"""Measurement events A1/A2/A4/A5 + periodical reporting (36.331 §5.5.4).

Reference behavior: `srsue/src/stack/rrc/rrc.cc` measurement section (event
evaluation, s-Measure, reportAmount) and `srsenb/src/stack/rrc/rrc.cc`
measConfig handling (A2 -> configure neighbour measurement; A4/A5 -> HO).
"""

import numpy as np

from srslte_emane_tpu.epc import hss as hss_mod, mme as mme_mod, \
    spgw as spgw_mod
from srslte_emane_tpu.runtime import otabus, phy_adapter, sinr, ttiloop
from srslte_emane_tpu.stack import enb_stack, rrc_msgs, rrc_wire, security, \
    ue_stack


def _network(pl, pcis=(1, 2)):
    prop = sinr.Propagation(pathloss_db=np.asarray(pl, np.float32))
    bus = otabus.OtaBus(prop, node_ids=list(range(len(pl))), n_prb=25)
    net = ttiloop.Network(bus)
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enbs = []
    for i, pci in enumerate(pcis):
        enb = enb_stack.EnbStack(mme, enb_id=i + 1, n_prb=25, pci=pci)
        net.add(phy_adapter.EnbPhyAdapter(bus, i, cell_id=pci, n_prb=25,
                                          mac=enb))
        enbs.append(enb)
    imsi, key = "001010000000001", bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
    ue = ue_stack.UeStack(ue_stack.Usim(
        imsi, key, security.milenage_opc(key, b"\x00" * 16)))
    net.add(phy_adapter.UePhyAdapter(bus, len(pl) - 1, cell_id=pcis[0],
                                     n_prb=25, stack=ue))
    return prop, net, mme, enbs, ue, spgw


# --------------------------- wire round-trips (every event arm)

def _roundtrip(cfg):
    msg = rrc_msgs.RrcConnectionReconfiguration(meas_config=cfg)
    data = rrc_wire.encode_dl_dcch(msg)
    out = rrc_wire.decode_dl_dcch(data)
    assert out.meas_config == cfg, (out.meas_config, cfg)
    return data


def test_wire_roundtrip_all_events():
    for event in ("a1", "a2", "a4"):
        _roundtrip(rrc_msgs.MeasConfig(reports=[rrc_msgs.ReportConfigEutra(
            meas_id=3, event=event, threshold=55, hysteresis_db=1.0,
            time_to_trigger=3, report_interval=240, report_amount=8)]))
    # periodical: TTT/hysteresis don't exist on the wire arm
    _roundtrip(rrc_msgs.MeasConfig(reports=[rrc_msgs.ReportConfigEutra(
        meas_id=3, event="periodical", hysteresis_db=0.0,
        time_to_trigger=0, report_interval=240, report_amount=8)]))
    _roundtrip(rrc_msgs.MeasConfig(reports=[rrc_msgs.ReportConfigEutra(
        meas_id=2, event="a5", threshold=30, threshold2=60)]))
    # multi-entry config with s-Measure
    _roundtrip(rrc_msgs.MeasConfig(
        reports=[
            rrc_msgs.ReportConfigEutra(meas_id=1, event="a3",
                                       offset_db=2.0),
            rrc_msgs.ReportConfigEutra(meas_id=2, event="a2", threshold=25),
        ],
        s_measure=45))


def test_wire_report_carries_meas_id():
    rep = rrc_msgs.MeasurementReport(rsrp_dbm=-95.0, neigh=[[7, -90.0]],
                                     meas_id=4)
    out = rrc_wire.decode_ul_dcch(rrc_wire.encode_ul_dcch(rep))
    assert out.meas_id == 4 and out.neigh[0][0] == 7


# --------------------------- A4-driven handover

def test_a4_event_drives_handover():
    """Network configures A4 only (neighbour above absolute threshold).
    Co-channel SINR is the pathloss difference, so at the firing point the
    neighbour is still BELOW serving + A3-offset — an A3 config would stay
    silent — yet the A4 report fires and drives the handover."""
    pl = [[0, 100, 72], [100, 0, 95], [72, 95, 0]]
    prop, net, mme, (enb_a, enb_b), ue, spgw = _network(pl)
    # A4 threshold RSRP_range 28 = -112 dBm <-> SINR -2 dB at the -110 ref
    enb_a.meas_config = rrc_msgs.MeasConfig(reports=[
        rrc_msgs.ReportConfigEutra(meas_id=2, event="a4", threshold=28,
                                   time_to_trigger=4, report_interval=60)])
    # target's own policy (pushed after HO): conservative A3 so the cell
    # edge doesn't ping-pong straight back
    enb_b.meas_config = rrc_msgs.MeasConfig(a3_offset_db=5.0,
                                            hysteresis_db=1.0)
    net.run(120)
    assert ue.emm_state == "REGISTERED"
    # B at -23 dB SINR (-133 dBm): far below threshold, silent
    net.run(120)
    assert ue.metrics.get("meas_report_a4", 0) == 0, dict(ue.metrics)
    # approach: B = -7 dB (-117 dBm) still below the -112 threshold
    prop.pathloss_db[0, 2] = prop.pathloss_db[2, 0] = 79
    prop.pathloss_db[1, 2] = prop.pathloss_db[2, 1] = 86
    net.run(120)
    assert ue.metrics.get("meas_report_a4", 0) == 0, dict(ue.metrics)
    # crossover region: B = -1 dB (-111 dBm) > threshold while STILL below
    # serving (+1 dB) — A3 could not fire here; A4 does and starts the HO
    prop.pathloss_db[0, 2] = prop.pathloss_db[2, 0] = 82
    prop.pathloss_db[1, 2] = prop.pathloss_db[2, 1] = 83
    net.run(50)
    assert ue.metrics.get("meas_report_a4", 0) >= 1, dict(ue.metrics)
    assert enb_a.metrics.get("meas_report_a4", 0) >= 1
    assert ue.metrics.get("meas_report_a3", 0) == 0
    # UE keeps moving toward B so RA at the target can complete
    for a_pl, b_pl in [(85, 80), (90, 75), (95, 70)]:
        prop.pathloss_db[0, 2] = prop.pathloss_db[2, 0] = a_pl
        prop.pathloss_db[1, 2] = prop.pathloss_db[2, 1] = b_pl
        net.run(60)
    net.run(100)
    assert ue.metrics.get("ho_complete", 0) == 1, dict(ue.metrics)
    assert ue.serving_pci == 2


def test_a2_configures_a4_followup_then_handover():
    """Serving degrades -> A2 report -> eNB pushes an A4 followup config
    (rrc.cc 'configure neighbour measurement on A2') -> A4 fires on the
    neighbour -> handover."""
    pl = [[0, 100, 72], [100, 0, 95], [72, 95, 0]]
    prop, net, mme, (enb_a, enb_b), ue, spgw = _network(pl)
    # A2 threshold RSRP_range 35 = -105 dBm <-> 5 dB SINR at the -110 ref
    enb_a.meas_config = rrc_msgs.MeasConfig(reports=[
        rrc_msgs.ReportConfigEutra(meas_id=1, event="a2", threshold=35,
                                   time_to_trigger=4, report_interval=100)])
    enb_a.a2_followup = rrc_msgs.ReportConfigEutra(
        meas_id=2, event="a4", threshold=27, time_to_trigger=4,
        report_interval=60)
    enb_b.meas_config = rrc_msgs.MeasConfig(a3_offset_db=5.0,
                                            hysteresis_db=1.0)
    net.run(120)
    assert ue.emm_state == "REGISTERED"
    # serving healthy (23 dB = -87 dBm > -105): no A2, no follow-up
    net.run(150)
    assert ue.metrics.get("meas_report_a2", 0) == 0, dict(ue.metrics)
    assert enb_a.metrics.get("meas_followup_cfg", 0) == 0
    # serving degrades toward the cell edge: +10 dB (-100 dBm) still above
    # the A2 threshold
    prop.pathloss_db[0, 2] = prop.pathloss_db[2, 0] = 78
    prop.pathloss_db[1, 2] = prop.pathloss_db[2, 1] = 88
    net.run(150)
    assert ue.metrics.get("meas_report_a2", 0) == 0, dict(ue.metrics)
    # cell edge: serving +2 dB (-108 dBm < -105) -> A2 fires -> eNB pushes
    # the A4 follow-up -> B (-2 dB = -112 dBm > -113) triggers it -> HO
    prop.pathloss_db[0, 2] = prop.pathloss_db[2, 0] = 81.5
    prop.pathloss_db[1, 2] = prop.pathloss_db[2, 1] = 83.5
    net.run(120)
    assert ue.metrics.get("meas_report_a2", 0) >= 1, dict(ue.metrics)
    assert enb_a.metrics.get("meas_followup_cfg", 0) == 1
    assert ue.metrics.get("meas_config_applied", 0) >= 2
    assert ue.metrics.get("meas_report_a4", 0) >= 1, dict(ue.metrics)
    # UE keeps moving so RA at the target can complete
    for a_pl, b_pl in [(85, 80), (90, 75), (95, 70)]:
        prop.pathloss_db[0, 2] = prop.pathloss_db[2, 0] = a_pl
        prop.pathloss_db[1, 2] = prop.pathloss_db[2, 1] = b_pl
        net.run(60)
    net.run(100)
    assert ue.metrics.get("ho_complete", 0) == 1, dict(ue.metrics)
    assert ue.serving_pci == 2


# --------------------------- periodical + reportAmount + A1 + s-Measure

def test_periodical_reporting_respects_amount():
    pl = [[0, 75]]
    prop = sinr.Propagation(pathloss_db=np.asarray(
        [[0, 75], [75, 0]], np.float32))
    bus = otabus.OtaBus(prop, node_ids=[0, 1], n_prb=25)
    net = ttiloop.Network(bus)
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb = enb_stack.EnbStack(mme, enb_id=1, n_prb=25, pci=1)
    enb.meas_config = rrc_msgs.MeasConfig(reports=[
        # reportAmount must be a 36.331 enum value (r1/r2/r4/...)
        rrc_msgs.ReportConfigEutra(meas_id=5, event="periodical",
                                   time_to_trigger=0, report_interval=120,
                                   report_amount=4)])
    net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=enb))
    imsi, key = "001010000000001", bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
    ue = ue_stack.UeStack(ue_stack.Usim(
        imsi, key, security.milenage_opc(key, b"\x00" * 16)))
    net.add(phy_adapter.UePhyAdapter(bus, 1, cell_id=1, n_prb=25, stack=ue))
    net.run(120)
    assert ue.emm_state == "REGISTERED"
    ip = ue.ip_addr
    for _ in range(10):
        spgw.handle_sgi_pdu(spgw_mod.make_ipv4("8.8.8.8", ip, b"k" * 30))
        net.run(60)
    # reportAmount=4 caps the series (36.331 reportAmount)
    assert ue.metrics.get("meas_report_periodical", 0) == 4, dict(ue.metrics)
    assert enb.metrics.get("meas_report_periodical", 0) == 4


def test_a1_fires_on_serving_above_threshold_and_s_measure_gates_a3():
    """Unit-level: drive the evaluation directly.  A1 triggers on serving
    quality alone; with s-Measure set above the serving level, A3 stays
    silent even with a strong neighbor."""
    sent = []
    ue = ue_stack.UeStack.__new__(ue_stack.UeStack)
    ue.metrics = __import__("collections").Counter()
    ue.rrc_state = "CONNECTED"
    ue.mac_state = "CONNECTED"
    ue.forbidden_pcis = set()
    ue.meas_cfg = rrc_msgs.MeasConfig(reports=[
        rrc_msgs.ReportConfigEutra(meas_id=1, event="a1", threshold=55,
                                   time_to_trigger=2, report_interval=10),
        rrc_msgs.ReportConfigEutra(meas_id=2, event="a3", offset_db=1.0,
                                   time_to_trigger=2, report_interval=10),
    ], s_measure=30)  # -110 dBm: serving far above -> no neighbor events
    ue._send_srb1 = lambda m: sent.append(m)
    ue.last_rsrp_snr = 30.0  # -80 dBm: above the A1 threshold (-85)
    for t in range(1, 8):
        ue.neighbor_meas(t, pci=9, snr_db=45.0)  # neighbor 15 dB above
    ids = [m.meas_id for m in sent]
    assert 1 in ids, ids            # A1 fired
    assert 2 not in ids, ids        # A3 gated by s-Measure
    assert ue.metrics["meas_report_a1"] >= 1
    # drop serving below s-Measure: A3 now allowed and fires
    ue.last_rsrp_snr = -5.0  # -115 dBm < s-Measure -110
    for t in range(10, 20):
        ue.neighbor_meas(t, pci=9, snr_db=10.0)
    assert 2 in [m.meas_id for m in sent]
