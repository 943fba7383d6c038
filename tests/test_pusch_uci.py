"""UCI on PUSCH: data + ACK/RI/CQI multiplexed, all recovered at the eNB."""

import jax
import numpy as np

from srslte_emane_tpu.ops import channel, ofdm
from srslte_emane_tpu.phch import grid as grid_mod, pusch, sch


def test_pusch_with_full_uci():
    cell = grid_mod.CellConfig(n_prb=25, cell_id=42)
    sf_idx, rnti, rb_start, l_prb, qm = 2, 0x5A, 0, 8, 2
    rng = np.random.default_rng(0)
    B = 2
    n_ack, n_ri, n_cqi = 1, 1, 6
    q_ack, q_ri, q_cqi, g_data = pusch.uci_dims(l_prb, qm, n_ack, n_ri, n_cqi)
    tbs = max(8, (int(g_data * 0.4) - 24) // 8 * 8)
    cfg = sch.SchConfig(tbs=tbs, G=g_data, Qm=qm, Nl=1)
    payload = rng.integers(0, 2, (B, tbs), dtype=np.int8)
    ack = rng.integers(0, 2, (B, n_ack), dtype=np.int8)
    ri = rng.integers(0, 2, (B, n_ri), dtype=np.int8)
    cqi = rng.integers(0, 2, (B, n_cqi), dtype=np.int8)
    g = pusch.encode(payload, cfg, cell, sf_idx, rnti, rb_start, l_prb,
                     uci=dict(ack=ack, ri=ri, cqi=cqi))
    t = ofdm.modulate(g, cell.n_prb)
    rx = channel.awgn(jax.random.PRNGKey(1), t, 10.0)
    rg = ofdm.demodulate(rx, cell.n_prb)
    out = pusch.decode(rg, cfg, cell, sf_idx, rnti, rb_start, l_prb,
                       uci_dims_in=(q_ack, q_ri, q_cqi, n_ack, n_ri, n_cqi))
    assert np.asarray(out["ok"]).all()
    np.testing.assert_array_equal(np.asarray(out["payload"]), payload)
    np.testing.assert_array_equal(np.asarray(out["ack"]), ack)
    np.testing.assert_array_equal(np.asarray(out["ri"]), ri)
    np.testing.assert_array_equal(np.asarray(out["cqi"]), cqi)


def test_mux_tables_consistency():
    from srslte_emane_tpu.phch import pusch_uci

    g, qm, q_ri, q_ack = 12 * 4 * 12 * 2, 2, 8, 8
    t = pusch_uci.mux_tables(g, qm, q_ri, q_ack)
    # every output position sourced exactly once; data positions unique
    assert len(t["out_src"]) == g
    dp = t["data_pos"][t["data_pos"] >= 0]
    assert len(np.unique(dp)) == len(dp)
    assert len(t["ri_pos"]) == q_ri and len(t["ack_pos"]) == q_ack
