"""End-to-end eMBMS: M2AP Session Start -> SIB13 broadcast -> MCCH area
config (true 36.331 UPER) -> MTCH payload delivery on PMCH to subscribed
UEs — the reference chain mbms-gw.cc -> srsenb rrc.cc SIB13/MCCH ->
srsue rrc.cc handle_sib13/mbms_service_start/parse_pdu_mch."""

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.epc import mbms_gw, spgw as spgw_mod
from srslte_emane_tpu.stack import rrc_msgs, rrc_wire


def test_sib13_and_mcch_wire_roundtrip():
    s = rrc_msgs.Sib13(area_id=3, mcch_offset=1, mcch_rep_rf=32, sig_mcs=2)
    assert rrc_wire.decode_bcch(rrc_wire.encode_bcch(s)) == s
    cfg = rrc_msgs.MbsfnAreaConfig(sf_alloc_end=64, data_mcs=4,
                                   sessions=[(7, 1), (9, 2)])
    back = rrc_wire.decode_mcch(rrc_wire.encode_mcch(cfg))
    assert back.sessions == [(7, 1), (9, 2)] and back.data_mcs == 4


def test_mbms_end_to_end():
    sysd = netsim.build_network(3, 75.0, n_prb=25)
    net, enb, ues = sysd["net"], sysd["enb"], sysd["ues"]
    gw = mbms_gw.MbmsGw(area_id=2)
    gw.add_enb_m2(enb.m2_endpoint())
    gw.add_enb(mbms_gw.enb_pmch_sink(enb.mbms_queue))
    assert gw.session_start(7)
    assert enb.mbms_sessions == {7: 1}
    ues[0].mbms_service_start(7, port=4321)  # subscribes before SI
    net.run(400)  # attach + SIB13 occasions + one MCCH occasion
    ues[1].mbms_service_start(7, port=4321)  # subscribes when idle
    net.run(400)
    assert ues[0].sib13 is not None and ues[0].sib13.area_id == 2
    assert ues[0].mbsfn_cfg is not None
    assert (7, 1) in [(int(a), int(b)) for a, b in ues[0].mbsfn_cfg.sessions]
    pkt = spgw_mod.make_ipv4("10.0.0.1", "239.0.0.7", b"m" * 100)
    for _ in range(4):
        gw.handle_sgi_mb_pdu(pkt)
    net.run(120)
    assert len(ues[0].mbms_rx) == 4
    assert ues[0].mbms_rx[0] == pkt
    assert len(ues[1].mbms_rx) == 4
    assert not getattr(ues[2], "mbms_rx", [])  # never subscribed
    assert enb.metrics["mtch_tx"] == 4 and enb.metrics["mcch_tx"] >= 2


def test_mbsfn_waveform_plane():
    """MTCH bytes through the REAL PMCH pipeline (hybrid-CP subframe,
    MBSFN-RS, area scrambling): one broadcast encode, per-receiver
    channels — the near receiver decodes every packet, a receiver 60 dB
    deeper fails CRC on all of them."""
    from srslte_emane_tpu.phch import grid as grid_mod
    from srslte_emane_tpu.runtime import wavesim

    cell = grid_mod.CellConfig(n_prb=6, cell_id=1)
    mp = wavesim.MbsfnPlane(cell, area_id=2)
    pkts = [b"mbms-%d" % i * 3 for i in range(3)]
    out = mp.send(pkts, {10: 80.0, 11: 140.0}, sf_idx=3)
    assert out[10] == pkts
    assert out[11] == [None, None, None]
    assert mp.metrics["crc_ok"] == 3 and mp.metrics["crc_fail"] == 3
