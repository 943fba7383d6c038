"""RRC procedures: release + paging re-entry, RLF -> reestablishment."""

import numpy as np

from srslte_emane_tpu.epc import hss as hss_mod, mme as mme_mod, spgw as spgw_mod
from srslte_emane_tpu.runtime import otabus, phy_adapter, sinr, ttiloop
from srslte_emane_tpu.stack import enb_stack, security, ue_stack


def _build():
    pl = np.array([[0, 80], [80, 0]], np.float32)
    prop = sinr.Propagation(pathloss_db=pl)
    bus = otabus.OtaBus(prop, node_ids=[0, 1], n_prb=25)
    net = ttiloop.Network(bus)
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb = enb_stack.EnbStack(mme, enb_id=1, n_prb=25)
    net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=enb))
    imsi, key = "001010000000001", bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
    ue = ue_stack.UeStack(ue_stack.Usim(imsi, key, security.milenage_opc(key, b"\x00" * 16)))
    net.add(phy_adapter.UePhyAdapter(bus, 1, cell_id=1, n_prb=25, stack=ue))
    return net, prop, enb, ue, spgw


def test_release_then_paging_reentry():
    net, prop, enb, ue, spgw = _build()
    net.run(60)
    assert ue.emm_state == "REGISTERED"
    rnti = ue.crnti
    enb.release_ue(rnti)
    net.run(10)
    assert ue.rrc_state == "IDLE"
    # page the UE -> queued until the paging occasion (36.304 PF: SFN mod T
    # == UE_ID mod T with T=32 radio frames), then RA + re-attach
    enb.page(0)  # broadcast identity 0 matches any
    net.run(20)
    assert enb.metrics.get("paging_tx", 0) == 0  # waiting for the PF
    net.run(330)
    assert enb.metrics.get("paging_tx", 0) == 1
    assert ue.metrics["paged"] == 1
    assert ue.rrc_state == "CONNECTED"


def test_rlf_reestablishment_preserves_session():
    net, prop, enb, ue, spgw = _build()
    net.run(60)
    assert ue.emm_state == "REGISTERED"
    old_rnti = ue.crnti
    ip = ue.ip_addr
    # deep fade: all DL traffic fails SINR -> UE declares RLF
    prop.pathloss_db[0, 1] = prop.pathloss_db[1, 0] = 150.0
    for _ in range(30):
        spgw.handle_sgi_pdu(spgw_mod.make_ipv4("8.8.8.8", ip, b"x" * 50))
        net.run(1)
    assert ue.metrics["rlf"] >= 1, dict(ue.metrics)
    # channel recovers -> reestablishment with context continuity
    prop.pathloss_db[0, 1] = prop.pathloss_db[1, 0] = 80.0
    net.run(60)
    assert ue.rrc_state == "CONNECTED"
    assert enb.metrics["rrc_reest"] == 1
    assert ue.ip_addr == ip  # session survived (no re-attach)
    # user plane still works end-to-end
    pkt = spgw_mod.make_ipv4("8.8.8.8", ip, b"after-rlf" * 10)
    assert spgw.handle_sgi_pdu(pkt)
    net.run(150)  # RLC AM first recovers the 30 faded PDUs (16 NACKs/status)
    assert any(p == pkt for p in ue.gw_rx)
    # and the in-fade packets were NOT lost: AM delivered all of them in order
    assert sum(1 for p in ue.gw_rx if p.endswith(b"x" * 50)) == 30


def test_t300_t311_expiry_on_dl_blackout():
    """36.331 timers on the TTI wheel (rrc.cc t300/t311 via timers.h):
    a DL blackout after RAR leaves the UE CONNECTING — T300 expiry drops
    it to idle; an RLF with the blackout still up exhausts T311 and the
    UE gives up reestablishment."""
    net, prop, enb, ue, spgw = _build()
    net.run(60)
    assert ue.emm_state == "REGISTERED"
    ip = ue.ip_addr
    # deep fade -> RLF -> REESTABLISHING with T311 running
    prop.pathloss_db[0, 1] = prop.pathloss_db[1, 0] = 150.0
    for _ in range(30):
        spgw.handle_sgi_pdu(spgw_mod.make_ipv4("8.8.8.8", ip, b"x" * 50))
        net.run(1)
    assert ue.metrics["rlf"] >= 1
    assert ue.rrc_state == "REESTABLISHING"
    assert ue.t311.is_running
    # blackout persists past the whole T311 window: UE leaves RRC
    net.run(1100)
    assert ue.metrics["t311_expiry"] == 1
    # back in idle; the persistent connect trigger may already be mid-RA
    # retry (PRACH the deaf eNB can't hear)
    assert ue.rrc_state == "IDLE"
    assert ue.mac_state in ("IDLE", "PRACH_SENT")
    assert ue.emm_state == "REGISTERED"  # NAS context intact
    # channel recovers: the pending-connect flag service-requests back in
    prop.pathloss_db[0, 1] = prop.pathloss_db[1, 0] = 80.0
    net.run(200)
    assert ue.rrc_state == "CONNECTED"
    assert ue.ip_addr == ip


def test_t304_expiry_falls_back_to_reestablishment():
    """Handover execution supervision: a reconfiguration with mobility
    toward a target that never answers the contention-free RA expires
    T304 and the UE reestablishes (36.331 §5.3.5.6)."""
    from srslte_emane_tpu.stack import rrc_msgs

    net, prop, enb, ue, spgw = _build()
    net.run(60)
    assert ue.rrc_state == "CONNECTED"
    # fake a handover command toward a PCI that does not exist
    ue._execute_handover(rrc_msgs.MobilityControlInfo(
        target_pci=99, new_rnti=0x99, dedicated_preamble=61))
    assert ue.t304.is_running
    net.run(260)
    assert ue.metrics["t304_expiry"] == 1
    assert ue.rrc_state in ("REESTABLISHING", "CONNECTED", "IDLE")
    assert ue.t311.is_running or ue.metrics.get("reest_ok", 0) >= 0


def test_sib_broadcast_and_acquisition():
    """eNB broadcasts SIB1/SIB2 on SI-RNTI; the UE acquires them before RA
    (rrc.cc SIB scheduling / cell selection)."""
    from srslte_emane_tpu.apps import netsim

    sysd = netsim.build_network(1, 70.0)
    net, enb, ue = sysd["net"], sysd["enb"], sysd["ues"][0]
    net.run(4)
    # no RA before SIB acquisition
    assert ue.mac_state == "IDLE" and ue.sib2 is None
    net.run(20)
    assert ue.metrics.get("sib1_rx", 0) >= 1
    net.run(80)
    assert ue.metrics.get("sib2_rx", 0) >= 1
    assert ue.sib2.n_preambles == 52
    assert ue.emm_state == "REGISTERED"
    assert enb.metrics.get("si_tx", 0) >= 4


def test_service_request_resumes_session_with_buffered_data():
    """24.301 Service Request: a paged registered-idle UE resumes its
    existing session (same IP, no re-attach); DL data that arrived while
    idle is buffered at the eNB and delivered after resume; a lost network
    context yields ServiceReject -> clean full re-attach."""
    from srslte_emane_tpu.apps import netsim

    sysd = netsim.build_network(1, 75.0, n_prb=25)
    net, mme, spgw, enb, ue = (sysd[k] for k in
                               ("net", "mme", "spgw", "enb", "ues"))
    ue = ue[0]
    net.run(150)
    ip0 = ue.ip_addr
    enb.release_ue(ue.crnti)
    net.run(100)
    assert (ue.rrc_state, ue.emm_state) == ("IDLE", "REGISTERED")
    spgw.handle_sgi_pdu(spgw_mod.make_ipv4("8.8.8.8", ip0, b"wake" * 50))
    mme.page_ue(1)
    net.run(400)
    assert ue.metrics.get("service_req") == 1
    assert ue.metrics.get("service_ok") == 1
    assert mme.metrics["attach_ok"] == 1  # no re-attach
    assert ue.ip_addr == ip0
    assert any(p.endswith(b"wake" * 50) for p in ue.gw_rx)
    # lost context -> reject -> full re-attach with a fresh session
    mme.ues.pop(1)
    enb.release_ue(ue.crnti)
    net.run(100)
    ue._connect_pending = True
    net.run(600)
    assert ue.metrics.get("service_reject") == 1
    assert ue.emm_state == "REGISTERED" and ue.ip_addr != ip0


def test_rrc_connection_reject_admission_control():
    """36.331 RRCConnectionReject: at max_rrc_users the eNB rejects new
    connections with waitTime; the UE backs off T302 and succeeds after
    capacity frees up."""
    import numpy as np

    from srslte_emane_tpu.epc import hss as hss_mod, mme as mme_mod
    from srslte_emane_tpu.epc import spgw as spgw_mod
    from srslte_emane_tpu.runtime import otabus, phy_adapter, sinr, ttiloop
    from srslte_emane_tpu.stack import enb_stack, security, ue_stack

    n = 3
    pl = np.full((n + 1, n + 1), 80.0, np.float32)
    prop = sinr.Propagation(pathloss_db=pl)
    bus = otabus.OtaBus(prop, node_ids=list(range(n + 1)), n_prb=25)
    net = ttiloop.Network(bus)
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb = enb_stack.EnbStack(mme, enb_id=1, n_prb=25)
    enb.max_rrc_users = 2
    net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=enb))
    ues = []
    for i in range(n):
        imsi = f"0010100000000{i:02d}"
        key = bytes(range(16))
        hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
        ue = ue_stack.UeStack(ue_stack.Usim(
            imsi, key, security.milenage_opc(key, b"\x00" * 16)),
            preamble=5 + i)
        net.add(phy_adapter.UePhyAdapter(bus, 1 + i, cell_id=1, n_prb=25,
                                         stack=ue))
        ues.append(ue)
    net.run(600)
    assert enb.metrics.get("rrc_reject", 0) >= 1
    rejected = [u for u in ues if u.metrics.get("rrc_rejected", 0)]
    assert rejected
    registered = [u for u in ues if u.emm_state == "REGISTERED"]
    assert len(registered) == 2
    # capacity frees up: the registered UEs go idle -> the rejected UE's
    # T302 expires and its retry succeeds
    for u in registered:
        enb.release_ue(u.crnti)
    net.run(2500)  # past the 2 s waitTime
    assert all(u.emm_state == "REGISTERED" for u in ues)
