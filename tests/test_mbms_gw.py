"""MBMS-GW multicast to multiple eNBs + PMCH message-level delivery."""

from srslte_emane_tpu.epc import mbms_gw, spgw as spgw_mod


def test_multicast_to_enbs():
    gw = mbms_gw.MbmsGw(area_id=3)
    q1, q2 = [], []
    gw.add_enb(mbms_gw.enb_pmch_sink(q1))
    gw.add_enb(mbms_gw.enb_pmch_sink(q2))
    pkt = spgw_mod.make_ipv4("239.0.0.1", "239.255.255.1", b"mbms-payload" * 5)
    gw.handle_sgi_mb_pdu(pkt)
    gw.handle_sgi_mb_pdu(pkt)
    assert len(q1) == 2 and len(q2) == 2
    area, payload = q1[0]
    assert area == 3 and payload == pkt
    assert gw.metrics["pkts"] == 2


def test_m2ap_session_start_before_data():
    from srslte_emane_tpu.epc import mbms_gw

    gw = mbms_gw.MbmsGw(area_id=2)
    enb_state = {}
    gw.add_enb_m2(mbms_gw.enb_m2_endpoint(enb_state))
    assert gw.session_start(7, tmgi=b"\x00\xf1\x10\x00\x00\x07")
    assert 7 in gw.sessions
    sess = enb_state["sessions"][7]
    assert sess.area_id == 2 and sess.tmgi.endswith(b"\x07")
