"""PDSCH MIMO transmission modes: TM2 (SFBC), TM3 (CDD), TM4 (SM) end-to-end
over flat 2x2 MIMO channels — the BASELINE config #5 shape."""

import jax
import numpy as np
import pytest

from srslte_emane_tpu.ops import channel, cplx, ofdm
from srslte_emane_tpu.phch import grid as grid_mod, pdsch, sch


def _mimo_link(tm, n_cw, snr_db, seed=0, pmi=0, n_prb=15):
    cell = grid_mod.CellConfig(n_prb=n_prb, cell_id=7, n_ports=2, cfi=1)
    sf_idx, rnti = 1, 0x46
    prb_mask = (1,) * n_prb
    n_re = grid_mod.nof_re(cell, sf_idx, prb_mask)
    rng = np.random.default_rng(seed)
    B = 2
    qm = 2
    cfgs, tbs_list = [], []
    for q in range(n_cw):
        G = n_re * qm
        tbs = max(8, (int(G * 0.4) - 24) // 8 * 8)
        cfgs.append(sch.SchConfig(tbs=tbs, G=G, Qm=qm, Nl=1))
        tbs_list.append(rng.integers(0, 2, (B, tbs), dtype=np.int8))
    grids = pdsch.encode_tm(tbs_list, cfgs, cell, sf_idx, rnti, prb_mask, tm, pmi)
    tx = ofdm.modulate(grids, cell.n_prb)  # (B, 2, T, 2)
    h = (rng.normal(size=(B, 2, 2)) + 1j * rng.normal(size=(B, 2, 2))).astype(np.complex64)
    # keep the channel well-conditioned for ZF modes
    h = h + 2.5 * np.eye(2)[None]
    rx = channel.mimo_flat(jax.random.PRNGKey(seed), tx, cplx.from_numpy(h), snr_db)
    rg = ofdm.demodulate(rx, cell.n_prb)  # (B, 2, 14, NRE, 2)
    outs, oks, _ = pdsch.decode_tm(rg, cfgs, cell, sf_idx, rnti, prb_mask, tm, pmi)
    return tbs_list, outs, oks


def test_tm2_sfbc():
    tbs, outs, oks = _mimo_link("tm2", 1, 10.0)
    assert np.asarray(oks[0]).all()
    np.testing.assert_array_equal(np.asarray(outs[0]), tbs[0])


def test_tm3_cdd_two_codewords():
    tbs, outs, oks = _mimo_link("tm3", 2, 16.0, seed=3)
    for q in range(2):
        assert np.asarray(oks[q]).all(), f"cw{q}"
        np.testing.assert_array_equal(np.asarray(outs[q]), tbs[q])


@pytest.mark.parametrize("pmi", [1, 2])
def test_tm4_sm_pmi(pmi):
    tbs, outs, oks = _mimo_link("tm4", 2, 16.0, seed=4 + pmi, pmi=pmi)
    for q in range(2):
        assert np.asarray(oks[q]).all(), f"cw{q}"
        np.testing.assert_array_equal(np.asarray(outs[q]), tbs[q])
