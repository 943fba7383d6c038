"""PBCH / PCFICH / PHICH end-to-end over AWGN grids."""

import jax
import numpy as np
import pytest

from srslte_emane_tpu.ops import channel, cplx, ofdm
from srslte_emane_tpu.phch import chest, grid as grid_mod, pbch, pcfich, phich, regs


CELL = grid_mod.CellConfig(n_prb=6, cell_id=301, n_ports=1, cfi=2)


def _through_channel(grid, key, snr_db, cell, sf_idx):
    """grid -> OFDM -> AWGN -> demod -> chest."""
    from srslte_emane_tpu.phch import pdsch

    g = pdsch.put_crs(grid, cell, sf_idx)
    t = ofdm.modulate(g, cell.n_prb)
    rx = channel.awgn(key, t, snr_db)
    rg = ofdm.demodulate(rx, cell.n_prb)
    ch = chest.estimate(rg, cell, sf_idx)
    return rg, ch


def test_regs_partition_disjoint():
    """PCFICH/PHICH/PDCCH REG assignments must not overlap and cover the
    control region."""
    for n_prb, cell_id in [(6, 0), (25, 301), (100, 17)]:
        ch = regs.channel_regs(n_prb, cell_id, 1)
        used = set(np.asarray(ch["pcfich"]).tolist())
        for g in ch["phich"].reshape(-1):
            assert g not in used
            used.add(int(g))
        for cfi in (1, 2, 3):
            pd = set(ch["pdcch"][cfi].tolist())
            assert not (pd & used)
            n_ctrl = grid_mod.n_ctrl_symbols(cfi, n_prb)
            total = len([r for r in regs.reg_table(n_prb, cell_id, 1) if r["l"] < n_ctrl])
            assert len(pd) + len([u for u in used if regs.reg_table(n_prb, cell_id, 1)[u]["l"] < n_ctrl]) == total


def test_pcfich_roundtrip():
    B = 3
    g = cplx.zeros((B, grid_mod.N_SYM, CELL.nre))
    cfis = np.array([1, 2, 3])
    g = pcfich.encode(cfis, CELL, 4, g)
    rg, ch = _through_channel(g, jax.random.PRNGKey(0), 10.0, CELL, 4)
    det, corr = pcfich.decode(rg, ch.ce, CELL, 4)
    np.testing.assert_array_equal(np.asarray(det), cfis)


def test_phich_roundtrip():
    B = 2
    ng = phich.n_groups(CELL.n_prb)
    rng = np.random.default_rng(0)
    acks = rng.choice([-1, 1], size=(B, ng, 8)).astype(np.float32)
    g = cplx.zeros((B, grid_mod.N_SYM, CELL.nre))
    g = phich.encode(acks, CELL, 3, g)
    rg, ch = _through_channel(g, jax.random.PRNGKey(1), 15.0, CELL, 3)
    corr = np.asarray(phich.decode(rg, ch.ce, CELL, 3))
    np.testing.assert_array_equal(np.sign(corr), acks)


@pytest.mark.parametrize("sfn_off", [0, 2])
def test_pbch_roundtrip(sfn_off):
    B = 2
    mib = np.tile(pbch.pack_mib(6, 4 * 25 + 4 * sfn_off), (B, 1))
    g = cplx.zeros((B, grid_mod.N_SYM, CELL.nre))
    g = pbch.encode(mib, CELL, sfn=4 * 25 + sfn_off, grid=g)
    rg, ch = _through_channel(g, jax.random.PRNGKey(2), 8.0, CELL, 0)
    out, ports, off, ok = pbch.decode(rg, ch.ce, CELL)
    assert np.asarray(ok).all()
    assert (np.asarray(ports) == 1).all()
    assert (np.asarray(off) == sfn_off).all()
    np.testing.assert_array_equal(np.asarray(out), mib)
    assert pbch.unpack_mib(np.asarray(out)[0])["n_prb"] == 6
