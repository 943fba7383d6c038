"""Full end-to-end attach + user-plane data through every layer:
UE (MAC/RLC/PDCP/RRC/NAS/USIM/GW) <-OTA bus-> eNB (MAC/RLC/PDCP/RRC/S1AP/GTPU)
<-> MME/HSS/SPGW — the SURVEY.md §3.3 call stack at message level."""

import numpy as np

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.epc import hss as hss_mod, mme as mme_mod, spgw as spgw_mod
from srslte_emane_tpu.runtime import otabus, phy_adapter, sinr, ttiloop
from srslte_emane_tpu.stack import enb_stack, security, ue_stack


def _build(n_ues=1, pathloss=80.0):
    n = 1 + n_ues
    pl = np.full((n, n), pathloss, np.float32)
    np.fill_diagonal(pl, 0)
    prop = sinr.Propagation(pathloss_db=pl)
    bus = otabus.OtaBus(prop, node_ids=list(range(n)), n_prb=25)
    net = ttiloop.Network(bus)

    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb = enb_stack.EnbStack(mme, enb_id=1, n_prb=25)
    net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=enb))

    ues = []
    for i in range(n_ues):
        imsi = f"00101000000000{i:02d}"
        key = bytes(range(16))
        hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
        opc = security.milenage_opc(key, b"\x00" * 16)
        ue = ue_stack.UeStack(ue_stack.Usim(imsi, key, opc), preamble=7 + i)
        net.add(phy_adapter.UePhyAdapter(bus, 1 + i, cell_id=1, n_prb=25, stack=ue))
        ues.append(ue)
    return net, mme, spgw, enb, ues


def test_full_attach():
    net, mme, spgw, enb, (ue,) = _build()
    net.run(60)
    assert ue.emm_state == "REGISTERED", (ue.emm_state, ue.rrc_state, ue.mac_state)
    assert ue.ip_addr == "172.16.0.2"
    assert mme.metrics["attach_ok"] == 1
    assert enb.metrics["reconfig_ok"] == 1
    # AS security is active: SRB1 PDCP uses EEA2/EIA2
    assert ue.pdcp[1].int_algo == security.EIA2
    assert ue.kenb is not None


def test_user_plane_both_directions():
    net, mme, spgw, enb, (ue,) = _build()
    net.run(60)
    assert ue.emm_state == "REGISTERED"
    # downlink: internet -> SGi -> SPGW -> GTP-U -> eNB -> ... -> UE GW
    dl_pkt = spgw_mod.make_ipv4("8.8.8.8", ue.ip_addr, b"dns-response" * 20)
    assert spgw.handle_sgi_pdu(dl_pkt)
    net.run(30)
    assert ue.gw_rx and ue.gw_rx[0] == dl_pkt
    # uplink: UE app -> GW -> DRB -> eNB GTP-U -> SPGW -> SGi
    ul_pkt = spgw_mod.make_ipv4(ue.ip_addr, "8.8.8.8", b"dns-query" * 10)
    ue.gw_send(ul_pkt)
    net.run(30)
    assert spgw.sgi_out and spgw.sgi_out[0] == ul_pkt
    assert spgw.metrics["dl_bytes"] > 0 and spgw.metrics["ul_bytes"] > 0


def test_multi_ue_attach_and_traffic():
    net, mme, spgw, enb, ues = _build(n_ues=3)
    net.run(120)
    for ue in ues:
        assert ue.emm_state == "REGISTERED", ue.emm_state
    ips = {ue.ip_addr for ue in ues}
    assert len(ips) == 3  # unique IPs allocated
    for ue in ues:
        spgw.handle_sgi_pdu(spgw_mod.make_ipv4("1.1.1.1", ue.ip_addr, b"x" * 500))
    net.run(60)
    for ue in ues:
        assert ue.gw_rx, f"{ue.usim.imsi} got no DL data"


def test_unknown_imsi_rejected():
    net, mme, spgw, enb, (ue,) = _build()
    mme.hss.subs.clear()  # no subscribers
    net.run(60)
    assert ue.emm_state != "REGISTERED"
    assert mme.metrics["auth_fail"] == 1


def test_t3410_attach_supervision():
    """nas.cc T3410: a UE whose link dies right after the RRC setup (attach
    request sent, no accept possible) must fall back to DEREGISTERED and
    complete the attach once the channel recovers."""
    sysd = netsim.build_network(1, 75.0, n_prb=25)
    net, prop, ue = sysd["net"], sysd["bus"].prop, sysd["ues"][0]
    # let it get as far as ATTACHING, then fade the channel hard
    for _ in range(400):
        net.run(1)
        if ue.emm_state == "ATTACHING":
            break
    if ue.emm_state == "ATTACHING":  # caught the window (timing-dependent)
        prop.pathloss_db[0, 1] = prop.pathloss_db[1, 0] = 150.0
        net.run(1100)  # > T3410 (1000 ttis)
        assert ue.metrics.get("t3410_expiry", 0) >= 1, dict(ue.metrics)
        assert ue.emm_state in ("DEREGISTERED", "ATTACHING")
        prop.pathloss_db[0, 1] = prop.pathloss_db[1, 0] = 75.0
    net.run(1500)
    assert ue.emm_state == "REGISTERED", (ue.emm_state, dict(ue.metrics))
