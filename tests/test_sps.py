"""Semi-persistent scheduling (36.331 sps-Config / 36.321 §5.10):
activation via ONE PDCCH DCI to the SPS C-RNTI, then PDCCH-free periodic
transmissions on the recurring allocation.  Reference: srsenb scheduler
SPS role for VoLTE-class flows."""

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.epc import spgw as spgw_mod


def test_sps_periodic_dl_without_pdcch():
    sysd = netsim.build_network(1, 70.0, n_prb=25)
    net, enb, spgw = sysd["net"], sysd["enb"], sysd["spgw"]
    net.run(150)
    ue = sysd["ues"][0]
    assert ue.emm_state == "REGISTERED"
    rnti = next(iter(enb.ues))
    enb.configure_sps(rnti, interval=20, tb_bytes=200)
    net.run(20)
    assert ue.metrics["sps_configured"] == 1
    assert ue.sps_cfg.interval_dl == 20
    sps_crnti = ue.sps_cfg.sps_crnti

    # count SPS PDCCH DCIs on the wire while a steady small flow runs
    dci_count = {"sps": 0}
    orig = enb.get_dl_sched

    def counting(tti):
        grants = orig(tti)
        for g in grants:
            if g.rnti == sps_crnti and not g.sps_no_dci:
                dci_count["sps"] += 1
            if g.sps_no_dci:
                assert g.rnti == sps_crnti
        return grants

    enb.get_dl_sched = counting
    # VoLTE-class flow: a small packet every 20 ms for 400 ms
    for i in range(20):
        spgw.handle_sgi_pdu(spgw_mod.make_ipv4(
            "8.8.8.8", ue.ip_addr, bytes([i]) * 80))
        net.run(20)
    enb.get_dl_sched = orig

    assert ue.metrics["sps_activated"] == 1
    assert enb.metrics["sps_activation_tx"] == 1
    assert dci_count["sps"] == 1  # exactly ONE PDCCH use: the activation
    assert enb.metrics["sps_tx"] >= 10  # recurring PDCCH-free occasions
    assert ue.metrics["sps_rx"] >= 10
    # every packet delivered (RLC AM + SPS occasions)
    got = sum(1 for p in ue.gw_rx if len(p) == 100)
    assert got == 20, got


def test_sps_ack_isolation_from_dynamic_harq():
    """SPS TBs generate no HARQ feedback, so the eNB's position-based ack
    bookkeeping for dynamic grants stays consistent while SPS runs."""
    sysd = netsim.build_network(1, 70.0, n_prb=25)
    net, enb, spgw = sysd["net"], sysd["enb"], sysd["spgw"]
    net.run(150)
    ue = sysd["ues"][0]
    rnti = next(iter(enb.ues))
    enb.configure_sps(rnti, interval=20, tb_bytes=120)
    net.run(20)
    # mixed traffic: SPS-sized trickle + large dynamic bursts
    for i in range(10):
        spgw.handle_sgi_pdu(spgw_mod.make_ipv4(
            "8.8.8.8", ue.ip_addr, bytes([i]) * 60))
        spgw.handle_sgi_pdu(spgw_mod.make_ipv4(
            "8.8.8.8", ue.ip_addr, b"bulk" * 300))
        net.run(40)
    net.run(200)
    ctx = enb.ues[rnti]
    assert not ctx.harq_fifo  # no stuck in-flight processes
    total = sum(len(p) for p in ue.gw_rx)
    assert total >= 10 * (80 + 1220)  # everything delivered