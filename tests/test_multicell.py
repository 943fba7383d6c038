"""Waveform-level multi-cell interference: orthogonal allocations decode,
co-channel collisions fail, capture works at high C/I."""

import jax
import numpy as np
import pytest

from srslte_emane_tpu.models import enb_dl, multicell
from srslte_emane_tpu.phch import grid as grid_mod, pdcch


def _cell_cfg(pci, prb_lo, prb_hi, n_prb=25, rnti=0x50):
    cell = grid_mod.CellConfig(n_prb=n_prb, cell_id=pci, cfi=2)
    cand = next(c for c in pdcch.candidates(cell, rnti, 1) if c[0] == 4)
    mask = tuple(1 if prb_lo <= i < prb_hi else 0 for i in range(n_prb))
    n_re = grid_mod.nof_re(cell, 1, mask)
    tbs = (n_re * 2 // 3) // 8 * 8
    return enb_dl.DlSubframeConfig(
        cell=cell, sf_idx=1, grants=((rnti, mask, 2, tbs, *cand),))


def _gains(matrix_db):
    lin = 10 ** (-np.asarray(matrix_db, np.float64) / 20.0)
    g = np.zeros(lin.shape + (2,), np.float32)
    g[..., 0] = lin
    return g


def test_two_cells_orthogonal_prbs_both_decode():
    ca = _cell_cfg(3, 0, 10)
    cb = _cell_cfg(6, 14, 24)
    cfg = multicell.MulticellConfig(cells=(ca, cb), serving=(0, 1),
                                    grant_of=(0, 0), snr_db=25.0)
    rng = np.random.default_rng(0)
    pa = [rng.integers(0, 2, (1, ca.grants[0][3]), dtype=np.int8)]
    pb = [rng.integers(0, 2, (1, cb.grants[0][3]), dtype=np.int8)]
    # ue0 near A (A 0dB, B -6dB); ue1 near B
    gains = _gains([[0.0, 6.0], [6.0, 0.0]])
    res = multicell.step(cfg, [pa, pb], gains, jax.random.PRNGKey(1))
    # control regions still collide (same PRBs) but data PRBs are orthogonal;
    # with 6 dB C/I the full chain must decode both UEs' data
    assert np.asarray(res[0][0]).all(), "UE0 failed"
    assert np.asarray(res[1][0]).all(), "UE1 failed"
    np.testing.assert_array_equal(np.asarray(res[0][1]), pa[0])
    np.testing.assert_array_equal(np.asarray(res[1][1]), pb[0])


def test_cochannel_collision_fails_then_capture():
    """Same PRBs in both cells: at 0 dB C/I the victim fails; at 20 dB C/I
    it captures."""
    ca = _cell_cfg(3, 0, 12)
    cb = _cell_cfg(6, 0, 12)
    cfg = multicell.MulticellConfig(cells=(ca, cb), serving=(0,),
                                    grant_of=(0,), snr_db=30.0)
    rng = np.random.default_rng(2)
    pa = [rng.integers(0, 2, (1, ca.grants[0][3]), dtype=np.int8)]
    pb = [rng.integers(0, 2, (1, cb.grants[0][3]), dtype=np.int8)]
    res_equal = multicell.step(cfg, [pa, pb], _gains([[0.0, 0.0]]),
                               jax.random.PRNGKey(3))
    assert not np.asarray(res_equal[0][0]).any(), "equal-power collision decoded?!"
    res_capture = multicell.step(cfg, [pa, pb], _gains([[0.0, 20.0]]),
                                 jax.random.PRNGKey(4))
    assert np.asarray(res_capture[0][0]).all(), "capture at 20 dB C/I failed"
