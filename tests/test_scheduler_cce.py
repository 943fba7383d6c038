"""Scheduler PDCCH realism: per-TTI CCE allocation over true 36.213 search
spaces (scheduler_grid.cc alloc_dci) and eNB-side UL HARQ entities with
adaptive retransmission (scheduler_harq.cc ul_harq_proc)."""

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.epc import spgw as spgw_mod
from srslte_emane_tpu.phch import grid as grid_mod, pdcch


def _flood(sysd, ip, n, size=400):
    spgw = sysd["spgw"]
    for i in range(n):
        spgw.handle_sgi_pdu(spgw_mod.make_ipv4(
            "8.8.8.8", ip, bytes([i % 256]) * size))


def test_dl_grants_never_share_cces():
    """10 backlogged UEs on a 25-PRB cell: every TTI's DCIs sit on disjoint
    CCEs, each dedicated DCI on a candidate of ITS RNTI's search space, and
    the narrow control region actually provokes deferrals — yet everyone is
    served to completion."""
    sysd = netsim.build_network(10, 75.0, n_prb=25)
    net, enb, ues = sysd["net"], sysd["enb"], sysd["ues"]
    net.run(600)
    assert all(u.ip_addr for u in ues)
    for u in ues:
        _flood(sysd, u.ip_addr, 10)

    orig = enb.get_dl_sched
    seen_multi = 0

    def checked(tti):
        nonlocal seen_multi
        grants = orig(tti)
        used = set()
        sf = tti % 10
        for g in grants:
            cces = set(range(g.cce_start, g.cce_start + g.l_aggr))
            assert not (cces & used), (tti, g.rnti, g.cce_start, g.l_aggr)
            used |= cces
            if g.rnti not in (enb.SI_RNTI,) and g.rnti in enb.ues:
                # dedicated DCI: must be a real candidate of this UE's
                # search space at this subframe (any CFI the eNB may pick)
                ok = any(
                    (g.l_aggr, g.cce_start) in pdcch.candidates(
                        grid_mod.CellConfig(n_prb=enb.n_prb,
                                            cell_id=enb.cell_pci, cfi=cfi),
                        g.rnti, sf)
                    for cfi in (1, 2, 3))
                assert ok, (tti, g.rnti, g.l_aggr, g.cce_start)
        if len([g for g in grants if g.rnti in enb.ues]) >= 3:
            seen_multi += 1
        return grants

    enb.get_dl_sched = checked
    net.run(500)
    enb.get_dl_sched = orig
    assert seen_multi > 0  # multiple dedicated DCIs really coexisted per TTI
    assert enb.metrics["cce_defer"] > 0  # the control region did fill
    got = sum(1 for u in ues if sum(len(p) for p in u.gw_rx) >= 10 * 420)
    assert got == 10, got


def test_enb_ul_harq_adaptive_retx():
    """A PUSCH CRC failure schedules an eNB-side adaptive retransmission:
    rv follows 0,2,3,1, the allocation widens and MCS drops; 4 failures
    drop the process."""
    sysd = netsim.build_network(1, 70.0, n_prb=50)
    net, enb = sysd["net"], sysd["enb"]
    net.run(150)
    rnti = list(enb.ues)[0]
    u = enb.ues[rnti]
    # UE signals buffer status -> eNB issues a fresh UL grant (ndi=1)
    u.bsr = 100
    enb.sr_detected(1000, rnti)
    g0 = [g for g in enb.get_ul_sched(1000) if g.rnti == rnti][0]
    assert g0.ndi == 1 and g0.rv == 0
    assert u.ul_harq_ent is not None and u.ul_harq_ent["n_tx"] == 1
    # CRC failure -> adaptive retx grant precedes everything next TTI
    enb.ul_crc_info(1004, rnti, False)
    g1 = [g for g in enb.get_ul_sched(1008) if g.rnti == rnti][0]
    assert g1.ndi == 0 and g1.rv == 2
    assert g1.l_prb > g0.l_prb or g1.mcs < g0.mcs
    # keep failing: rv walks the sequence, then the entity drops
    enb.ul_crc_info(1012, rnti, False)
    g2 = [g for g in enb.get_ul_sched(1016) if g.rnti == rnti][0]
    assert g2.rv == 3
    enb.ul_crc_info(1020, rnti, False)
    g3 = [g for g in enb.get_ul_sched(1024) if g.rnti == rnti][0]
    assert g3.rv == 1
    enb.ul_crc_info(1028, rnti, False)
    assert u.ul_harq_ent is None
    assert enb.metrics["ul_harq_drop"] == 1
    assert not [g for g in enb.get_ul_sched(1032) if g.rnti == rnti]
    # success path clears the entity without a retx
    u.bsr = 50
    enb.sr_detected(1040, rnti)
    enb.get_ul_sched(1040)
    enb.ul_crc_info(1044, rnti, True)
    assert u.ul_harq_ent is None
