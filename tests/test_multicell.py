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


def test_multicell_over_sharded_ota_medium():
    """Multicell waveform emulation over the SHARDED OTA medium: each of
    4 mesh nodes hosts one (cell, UE) pair; the serving signal stays
    node-local, interference rides ONE all_gather over the 'node' axis
    (parallel/ota_collective.py), and every UE's full receive chain
    decodes its serving cell through the interference mix."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from srslte_emane_tpu.ops import channel, cplx
    from srslte_emane_tpu.parallel import mesh as mesh_mod, ota_collective
    from srslte_emane_tpu.models import ue_dl

    n = 4
    mesh = mesh_mod.make_mesh(n, node_axis=n)
    rng = np.random.default_rng(0)
    # 4 cells on disjoint PRB thirds-ish of a 15-PRB carrier; distinct PCIs
    cfgs = [_cell_cfg(10 + ci, 3 * ci, 3 * ci + 3, n_prb=15) for ci in range(n)]
    B = 2
    payloads = [rng.integers(0, 2, (B, c.grants[0][3]), dtype=np.int8)
                for c in cfgs]
    txs = jnp.stack([enb_dl.build_subframe(c, [p])
                     for c, p in zip(cfgs, payloads)])  # (n, B, T, 2)
    sh = NamedSharding(mesh, P("node", None, None, None))
    txs = jax.device_put(txs, sh)

    # link gains: serving (diagonal) 0 dB; interference -20 dB
    g = np.full((n, n), 10 ** (-20 / 20), np.complex64)
    np.fill_diagonal(g, 0.0)  # diagonal handled locally below
    interference = ota_collective.ota_mix_sharded(mesh, txs, g, noise_std=0.0)
    rx = interference + txs  # serving signal never leaves the node
    rx = channel.awgn(jax.random.PRNGKey(3), rx, 25.0)

    for ui, cfg in enumerate(cfgs):
        res, _ = ue_dl.decode_subframe(rx[ui], cfg)
        assert np.asarray(res.crc_ok[0]).all(), ui
        assert (np.asarray(res.payloads[0]) == payloads[ui]).all(), ui
