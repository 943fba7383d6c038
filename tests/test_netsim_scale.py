"""Mass attach: many UEs powering on together must converge (randomized RA
backoff, orthogonal PUCCH resources, no broadcast-HARQ flooding)."""

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.epc import spgw as spgw_mod


def test_twenty_ue_mass_attach_and_traffic():
    sysd = netsim.build_network(20, 75.0, n_prb=50)
    net, spgw, enb, ues = sysd["net"], sysd["spgw"], sysd["enb"], sysd["ues"]
    net.run(800)
    attached = [u for u in ues if u.emm_state == "REGISTERED"]
    assert len(attached) == 20, len(attached)
    # traffic to all UEs
    for u in attached:
        spgw.handle_sgi_pdu(spgw_mod.make_ipv4("8.8.8.8", u.ip_addr, b"x" * 300))
    net.run(300)
    got = sum(1 for u in attached if any(len(p) == 320 for p in u.gw_rx))
    assert got == 20, got
