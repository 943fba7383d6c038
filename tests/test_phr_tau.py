"""Power Headroom Reporting (36.321 §5.4.6) and the periodic
Tracking Area Update procedure (24.301 §5.3.5 T3412)."""

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.epc import spgw as spgw_mod
from srslte_emane_tpu.stack import pdu


def test_phr_ce_codec():
    assert pdu.phr_db(pdu.phr_ce(0.0)) == 0.0
    assert pdu.phr_db(pdu.phr_ce(-23.0)) == -23.0
    assert pdu.phr_db(pdu.phr_ce(40.0)) == 40.0
    assert pdu.phr_db(pdu.phr_ce(99.0)) == 40.0  # saturates


def test_phr_reported_and_caps_ul_mcs():
    """A cell-edge UE reports low power headroom; the scheduler caps its
    UL MCS below the cell-center UE's (scheduler_ue.cc PHR adaptation)."""
    sysd = netsim.build_network(2, 70.0, ue_pathloss=[70.0, 110.0])
    net, enb, ues = sysd["net"], sysd["enb"], sysd["ues"]
    net.run(300)
    assert all(u.emm_state == "REGISTERED" for u in ues)
    # uplink traffic so both UEs get PUSCH grants carrying the PHR CE
    for u in ues:
        u.gw_send(spgw_mod.make_ipv4(u.ip_addr, "8.8.8.8", b"u" * 200))
    net.run(300)
    assert enb.metrics["phr_rx"] >= 2
    ctxs = {r: c for r, c in enb.ues.items()}
    phrs = sorted(getattr(c, "phr_db", None) for c in ctxs.values())
    assert phrs[0] < phrs[1]  # cell-edge UE reports less headroom
    # grab fresh UL grants: the low-PHR UE's MCS is capped
    mcs = {}
    for r, c in ctxs.items():
        c.bsr = 50
        enb.sr_detected(5000, r)
    for g in enb.get_ul_sched(5000):
        mcs[g.rnti] = g.mcs
    lo_rnti = min(ctxs, key=lambda r: ctxs[r].phr_db)
    hi_rnti = max(ctxs, key=lambda r: ctxs[r].phr_db)
    assert mcs[lo_rnti] < mcs[hi_rnti], (mcs, {r: c.phr_db
                                               for r, c in ctxs.items()})


def test_periodic_tau_t3412():
    """Released registered UE runs T3412; expiry drives a TAU request;
    the MME accepts, refreshes the timer, and releases back to idle."""
    sysd = netsim.build_network(1, 70.0)
    net, mme, enb = sysd["net"], sysd["mme"], sysd["enb"]
    net.run(150)
    ue = sysd["ues"][0]
    assert ue.emm_state == "REGISTERED"
    enb.release_ue(ue.crnti, cause="user-inactivity")
    net.run(50)
    assert ue.rrc_state == "IDLE"
    assert ue.t3412.is_running
    net.run(700)  # past T3412 (500) + the TAU exchange
    assert ue.metrics.get("tau_req", 0) >= 1
    assert ue.metrics.get("tau_ok", 0) >= 1
    assert mme.metrics.get("tau_ok", 0) >= 1
    # back to registered-idle with the timer re-armed for the next period
    net.run(100)
    assert (ue.rrc_state, ue.emm_state) == ("IDLE", "REGISTERED")
    assert ue.t3412.is_running


def test_aka_sqn_resynchronisation():
    """A UE whose USIM SQN counter is AHEAD of the HSS (e.g. the HSS
    database was restored from backup) attaches through the AUTS resync:
    Authentication Failure (synch-failure) -> HSS adopts SQN_ms -> fresh
    vector -> attach completes (hss.cc resync_sqn / TS 33.102 §6.3.5)."""
    sysd = netsim.build_network(1, 70.0)
    net, mme, ue = sysd["net"], sysd["mme"], sysd["ues"][0]
    ue.usim.sqn_ms = 1000  # HSS counter starts at 0: first AUTN is stale
    net.run(200)
    assert ue.metrics.get("auth_sync_failure", 0) == 1
    assert mme.metrics.get("sqn_resync", 0) == 1
    assert ue.emm_state == "REGISTERED"
    assert ue.usim.sqn_ms == 1001  # adopted + incremented by the retry


def test_long_bsr_when_srb_and_drb_pending():
    """Simultaneous SRB + DRB uplink backlog triggers the Long BSR CE
    (four 6-bit LCG indices, 36.321 §5.4.5 / Table 6.1.3.1-1)."""
    assert pdu.bsr_index(0) == 0 and pdu.bsr_index(10) == 1
    assert pdu.bsr_index(150001) == 63
    ce = pdu.long_bsr_ce([100, 0, 5000, 0])
    assert len(ce) == 3
    got = pdu.long_bsr_bytes(ce)
    assert got[0] >= 100 and got[2] >= 5000 and got[1] == got[3] == 0

    from srslte_emane_tpu.stack import nas_msgs

    sysd = netsim.build_network(1, 70.0)
    net, enb, ue = sysd["net"], sysd["enb"], sysd["ues"][0]
    net.run(150)
    # backlog BOTH LCGs beyond one transport block so the post-drain BSR
    # sees data in two groups
    for _ in range(80):
        ue._send_nas(nas_msgs.ServiceRequest(guti=ue.guti))
    for _ in range(5):
        ue.gw_send(spgw_mod.make_ipv4(ue.ip_addr, "8.8.8.8", b"u" * 1100))
    net.run(100)
    assert ue.metrics.get("long_bsr_tx", 0) >= 1
    assert enb.metrics.get("long_bsr_rx", 0) >= 1
