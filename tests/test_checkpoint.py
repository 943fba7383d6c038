"""Checkpoint/resume: a restored emulation continues identically."""

import numpy as np

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.epc import spgw as spgw_mod
from srslte_emane_tpu.runtime import checkpoint


def test_snapshot_resume_determinism():
    sysd = netsim.build_network(2, 80.0)
    sysd["net"].run(80)
    assert all(u.emm_state == "REGISTERED" for u in sysd["ues"])
    blob = checkpoint.snapshot(sysd)

    # branch A: continue original
    for u in sysd["ues"]:
        sysd["spgw"].handle_sgi_pdu(spgw_mod.make_ipv4("9.9.9.9", u.ip_addr, b"z" * 123))
    sysd["net"].run(40)
    a_state = [(u.crnti, u.emm_state, len(u.gw_rx)) for u in sysd["ues"]]
    a_tti = sysd["bus"].curr_tti

    # branch B: restore and replay the same steps
    sysd2 = checkpoint.restore(blob)
    for u in sysd2["ues"]:
        sysd2["spgw"].handle_sgi_pdu(spgw_mod.make_ipv4("9.9.9.9", u.ip_addr, b"z" * 123))
    sysd2["net"].run(40)
    b_state = [(u.crnti, u.emm_state, len(u.gw_rx)) for u in sysd2["ues"]]
    assert a_state == b_state
    assert sysd2["bus"].curr_tti == a_tti
    # payload content identical
    assert sysd2["ues"][0].gw_rx[-1] == sysd["ues"][0].gw_rx[-1]
