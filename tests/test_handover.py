"""S1 intra-MME handover: measurement-triggered, contention-free RA at the
target, path switch, session continuity."""

import numpy as np

from srslte_emane_tpu.epc import hss as hss_mod, mme as mme_mod, spgw as spgw_mod
from srslte_emane_tpu.runtime import otabus, phy_adapter, sinr, ttiloop
from srslte_emane_tpu.stack import enb_stack, security, ue_stack


def test_s1_handover():
    # nodes: 0 = eNB A (pci 1), 1 = eNB B (pci 2), 2 = UE (near A initially)
    pl = np.array([[0, 100, 70], [100, 0, 95], [70, 95, 0]], np.float32)
    prop = sinr.Propagation(pathloss_db=pl)
    bus = otabus.OtaBus(prop, node_ids=[0, 1, 2], n_prb=25)
    net = ttiloop.Network(bus)
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb_a = enb_stack.EnbStack(mme, enb_id=1, n_prb=25, pci=1)
    enb_b = enb_stack.EnbStack(mme, enb_id=2, n_prb=25, pci=2)
    net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=enb_a))
    net.add(phy_adapter.EnbPhyAdapter(bus, 1, cell_id=2, n_prb=25, mac=enb_b))
    imsi, key = "001010000000001", bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
    ue = ue_stack.UeStack(ue_stack.Usim(imsi, key, security.milenage_opc(key, b"\x00" * 16)))
    net.add(phy_adapter.UePhyAdapter(bus, 2, cell_id=1, n_prb=25, stack=ue))

    net.run(80)
    assert ue.emm_state == "REGISTERED"
    ip = ue.ip_addr
    # keep some DL traffic flowing so the serving-cell SNR stays sampled
    spgw.handle_sgi_pdu(spgw_mod.make_ipv4("8.8.8.8", ip, b"pre" * 30))
    net.run(20)
    assert ue.gw_rx

    # UE "moves" gradually toward B: crossover over ~200 TTIs
    for a_pl, b_pl in [(75, 90), (79, 86), (82, 83), (83, 82), (85, 80),
                       (90, 75), (95, 70)]:
        prop.pathloss_db[0, 2] = prop.pathloss_db[2, 0] = a_pl
        prop.pathloss_db[1, 2] = prop.pathloss_db[2, 1] = b_pl
        spgw.handle_sgi_pdu(spgw_mod.make_ipv4("8.8.8.8", ip, b"move" * 10))
        net.run(30)
    net.run(60)
    assert ue.metrics.get("meas_reports", 0) >= 1, dict(ue.metrics)
    assert enb_a.metrics.get("ho_required", 0) >= 1, dict(enb_a.metrics)
    assert enb_b.metrics.get("ho_admitted", 0) == 1, dict(enb_b.metrics)
    assert ue.metrics.get("ho_complete", 0) == 1, dict(ue.metrics)
    assert enb_b.metrics.get("ho_complete", 0) == 1, dict(enb_b.metrics)
    assert mme.metrics.get("handover_ok", 0) == 1
    assert ue.serving_pci == 2

    # user plane continues through the TARGET after path switch, same IP
    n_before = len(ue.gw_rx)
    pkt = spgw_mod.make_ipv4("8.8.8.8", ip, b"post-ho" * 20)
    assert spgw.handle_sgi_pdu(pkt)
    net.run(40)
    assert len(ue.gw_rx) > n_before
    assert ue.gw_rx[-1] == pkt
    assert ue.ip_addr == ip


def test_x2_handover_with_data_forwarding():
    """X2 HO: direct eNB-eNB preparation (no MME until path switch), DL data
    arriving mid-handover rides the X2-U forwarding tunnel and is delivered
    in order at the target before post-path-switch traffic."""
    pl = np.array([[0, 100, 70], [100, 0, 95], [70, 95, 0]], np.float32)
    prop = sinr.Propagation(pathloss_db=pl)
    bus = otabus.OtaBus(prop, node_ids=[0, 1, 2], n_prb=25)
    net = ttiloop.Network(bus)
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb_a = enb_stack.EnbStack(mme, enb_id=1, n_prb=25, pci=1)
    enb_b = enb_stack.EnbStack(mme, enb_id=2, n_prb=25, pci=2)
    enb_a.x2_setup(enb_b)  # X2 neighbor relation -> X2 HO instead of S1
    net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=enb_a))
    net.add(phy_adapter.EnbPhyAdapter(bus, 1, cell_id=2, n_prb=25, mac=enb_b))
    imsi, key = "001010000000001", bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
    ue = ue_stack.UeStack(ue_stack.Usim(imsi, key, security.milenage_opc(key, b"\x00" * 16)))
    net.add(phy_adapter.UePhyAdapter(bus, 2, cell_id=1, n_prb=25, stack=ue))

    net.run(80)
    assert ue.emm_state == "REGISTERED"
    ip = ue.ip_addr
    spgw.handle_sgi_pdu(spgw_mod.make_ipv4("8.8.8.8", ip, b"pre" * 30))
    net.run(20)

    for a_pl, b_pl in [(75, 90), (79, 86), (82, 83), (83, 82), (85, 80),
                       (90, 75), (95, 70)]:
        prop.pathloss_db[0, 2] = prop.pathloss_db[2, 0] = a_pl
        prop.pathloss_db[1, 2] = prop.pathloss_db[2, 1] = b_pl
        # DL packets every step: some will land mid-HO and must be forwarded
        spgw.handle_sgi_pdu(spgw_mod.make_ipv4("8.8.8.8", ip, b"move" * 10))
        net.run(30)
    net.run(60)
    assert enb_a.metrics.get("ho_x2", 0) == 1, dict(enb_a.metrics)
    assert enb_a.metrics.get("ho_required", 0) == 0  # no S1 preparation
    assert enb_b.metrics.get("ho_admitted_x2", 0) == 1, dict(enb_b.metrics)
    assert enb_b.metrics.get("ho_complete", 0) == 1, dict(enb_b.metrics)
    assert mme.metrics.get("handover_ok", 0) == 1  # path switch still S1
    assert ue.serving_pci == 2

    # continuity through the target, same IP
    n_before = len(ue.gw_rx)
    pkt = spgw_mod.make_ipv4("8.8.8.8", ip, b"post-x2" * 20)
    assert spgw.handle_sgi_pdu(pkt)
    net.run(40)
    assert len(ue.gw_rx) > n_before
    assert ue.gw_rx[-1] == pkt
    # all the "move" datagrams arrived exactly once, in order
    moves = [p for p in ue.gw_rx if p.endswith(b"move" * 10)]
    assert len(moves) == 7, len(moves)


def test_idle_mode_cell_reselection():
    """A released (idle) UE reselects to a stronger neighbor cell and can
    attach there (36.304 reselection with hysteresis)."""
    pl = np.array([[0, 100, 70], [100, 0, 95], [70, 95, 0]], np.float32)
    prop = sinr.Propagation(pathloss_db=pl)
    bus = otabus.OtaBus(prop, node_ids=[0, 1, 2], n_prb=25)
    net = ttiloop.Network(bus)
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb_a = enb_stack.EnbStack(mme, enb_id=1, n_prb=25, pci=1)
    enb_b = enb_stack.EnbStack(mme, enb_id=2, n_prb=25, pci=2)
    net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=enb_a))
    net.add(phy_adapter.EnbPhyAdapter(bus, 1, cell_id=2, n_prb=25, mac=enb_b))
    imsi, key = "001010000000001", bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
    ue = ue_stack.UeStack(ue_stack.Usim(imsi, key, security.milenage_opc(key, b"\x00" * 16)))
    net.add(phy_adapter.UePhyAdapter(bus, 2, cell_id=1, n_prb=25, stack=ue))
    net.run(80)
    assert ue.emm_state == "REGISTERED" and ue.serving_pci in (None, 1)
    enb_a.release_ue(ue.crnti)
    net.run(10)
    assert ue.rrc_state == "IDLE"
    # UE "moves": B becomes much stronger than A
    prop.pathloss_db[0, 2] = prop.pathloss_db[2, 0] = 95.0
    prop.pathloss_db[1, 2] = prop.pathloss_db[2, 1] = 70.0
    net.run(120)
    assert ue.metrics.get("reselection", 0) >= 1
    assert ue.serving_pci == 2


def test_network_pushed_meas_config_controls_a3():
    """The A3 parameters come from the network's measConfig (36.331
    §5.5.2), not UE hardcoding: with a 14 dB a3-offset pushed in the
    reconfiguration (the 36.331 a3-Offset field tops out at 15 dB), a
    neighbor 6 dB above serving must NOT trigger a measurement report;
    with the default 1 dB offset it must."""
    from srslte_emane_tpu.stack import rrc_msgs

    for offset, expect_reports in ((14.0, False), (1.0, True)):
        # UE camps on A (stronger at attach); B gets 6 dB better afterward
        pl = np.array([[0, 100, 74], [100, 0, 95], [74, 95, 0]], np.float32)
        prop = sinr.Propagation(pathloss_db=pl)
        bus = otabus.OtaBus(prop, node_ids=[0, 1, 2], n_prb=25)
        net = ttiloop.Network(bus)
        hss = hss_mod.Hss()
        spgw = spgw_mod.Spgw()
        mme = mme_mod.Mme(hss, spgw)
        enb_a = enb_stack.EnbStack(mme, enb_id=1, n_prb=25, pci=1)
        enb_a.meas_config = rrc_msgs.MeasConfig(a3_offset_db=offset)
        enb_b = enb_stack.EnbStack(mme, enb_id=2, n_prb=25, pci=2)
        net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=enb_a))
        net.add(phy_adapter.EnbPhyAdapter(bus, 1, cell_id=2, n_prb=25, mac=enb_b))
        imsi, key = "001010000000001", bytes(range(16))
        hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
        ue = ue_stack.UeStack(ue_stack.Usim(
            imsi, key, security.milenage_opc(key, b"\x00" * 16)))
        net.add(phy_adapter.UePhyAdapter(bus, 2, cell_id=1, n_prb=25, stack=ue))
        net.run(100)
        assert ue.emm_state == "REGISTERED"
        assert ue.metrics.get("meas_config_applied", 0) >= 1
        assert ue.meas_cfg.a3_offset_db == offset
        # B becomes 6 dB better than serving A
        prop.pathloss_db[1, 2] = prop.pathloss_db[2, 1] = 68.0
        # DL traffic keeps serving SNR sampled
        for _ in range(10):
            spgw.handle_sgi_pdu(spgw_mod.make_ipv4("8.8.8.8", ue.ip_addr,
                                                   b"m" * 60))
            net.run(30)
        got = ue.metrics.get("meas_reports", 0) >= 1
        assert got == expect_reports, (offset, dict(ue.metrics))


def test_sib3_q_hyst_controls_reselection():
    """Reselection hysteresis comes from the broadcast SIB3 (36.304
    Qhyst via rrc.cc handle_sib3), not UE hardcoding: with Qhyst=24 dB
    on the air a ~12 dB-better (in SINR) neighbor stays unselected; the
    metric proves the UE applied the broadcast value."""
    pl = np.array([[0, 100, 70], [100, 0, 95], [70, 95, 0]], np.float32)
    prop = sinr.Propagation(pathloss_db=pl)
    bus = otabus.OtaBus(prop, node_ids=[0, 1, 2], n_prb=25)
    net = ttiloop.Network(bus)
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb_a = enb_stack.EnbStack(mme, enb_id=1, n_prb=25, pci=1)
    enb_a.q_hyst_db = 24
    enb_b = enb_stack.EnbStack(mme, enb_id=2, n_prb=25, pci=2)
    enb_b.q_hyst_db = 24
    net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=enb_a))
    net.add(phy_adapter.EnbPhyAdapter(bus, 1, cell_id=2, n_prb=25, mac=enb_b))
    imsi, key = "001010000000001", bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
    ue = ue_stack.UeStack(ue_stack.Usim(
        imsi, key, security.milenage_opc(key, b"\x00" * 16)))
    net.add(phy_adapter.UePhyAdapter(bus, 2, cell_id=1, n_prb=25, stack=ue))
    net.run(80)
    assert ue.emm_state == "REGISTERED"
    enb_a.release_ue(ue.crnti)
    # camp long enough to cross a SIB3 occasion (every 160 TTIs): a
    # just-released UE still runs the old Qhyst until it reads SI
    net.run(200)
    assert ue.rrc_state == "IDLE"
    assert ue.metrics.get("sib3_rx", 0) >= 1
    assert ue.RESEL_HYST_DB == 24.0
    prop.pathloss_db[0, 2] = prop.pathloss_db[2, 0] = 90.0
    prop.pathloss_db[1, 2] = prop.pathloss_db[2, 1] = 84.0
    net.run(200)
    assert ue.metrics.get("sib3_rx", 0) >= 1
    assert ue.RESEL_HYST_DB == 24.0
    assert ue.metrics.get("reselection", 0) == 0
    assert ue.serving_pci == 1
