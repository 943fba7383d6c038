"""PDSCH: downlink shared channel symbol chain (SISO/TM1 first).

Reference behavior: `lib/src/phy/phch/pdsch.c` — encode: scrambling ->
modulation -> layer map -> precoding -> RE mapping honoring holes
(pdsch.c:81-233); decode: predecoding -> soft demod -> descramble -> DL-SCH
decode with CSI-weighted LLR scaling (pdsch.c:574-686).

TPU design: the RE map is a host-precomputed flat index table (grid.py); the
device path is gathers, matmul DFTs, VPU demod, and the batched SCH codec.
Everything is batched over subframes (axis B) — the TPU analogue of the
reference's sf_worker pipeline parallelism (txrx.cc:105-145).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import cplx, modem, scrambling
from . import chest, grid as grid_mod, sch


def put_crs(grid, cell: grid_mod.CellConfig, sf_idx: int, port: int = 0):
    """Scatter CRS pilots for `port` into grid (..., 14, NRE, 2)."""
    ks = grid_mod.crs_k(cell.cell_id, cell.n_prb, port)
    syms = grid_mod.pilot_syms(port)
    vals = grid_mod.crs_values(cell.cell_id, sf_idx, cell.n_prb, port)
    pidx = (np.asarray(syms)[:, None] * cell.nre + ks).reshape(-1).astype(np.int32)
    flat = grid.reshape(grid.shape[:-3] + (grid_mod.N_SYM * cell.nre, 2))
    v = cplx.from_numpy(vals.reshape(-1))
    flat = flat.at[..., jnp.asarray(pidx), :].set(jnp.broadcast_to(v, flat.shape[:-2] + v.shape))
    return flat.reshape(grid.shape)


def encode(tb_bits, cfg: sch.SchConfig, cell: grid_mod.CellConfig, sf_idx: int,
           rnti: int, prb_mask: tuple, grid=None, codeword_q: int = 0):
    """Encode one PDSCH grant into a subframe grid.

    tb_bits: (B, tbs). Returns grid (B, 14, NRE, 2) with CRS + PDSCH placed.
    """
    re_idx = grid_mod.pdsch_re_indices(cell, sf_idx, prb_mask)
    assert cfg.G == len(re_idx) * cfg.Qm, (cfg.G, len(re_idx), cfg.Qm)
    cw = sch.encode_tb(tb_bits, cfg)  # (B, G)
    c_init = scrambling.pdsch_cinit(rnti, codeword_q, sf_idx, cell.cell_id)
    scr = scrambling.scramble_bits(cw, c_init)
    syms = modem.modulate(scr, modem.MOD_FROM_QM[cfg.Qm])  # (B, n_re, 2)
    B = syms.shape[0]
    if grid is None:
        grid = cplx.zeros((B, grid_mod.N_SYM, cell.nre))
    flat = grid.reshape(B, grid_mod.N_SYM * cell.nre, 2)
    flat = flat.at[:, jnp.asarray(re_idx), :].set(syms)
    grid = flat.reshape(B, grid_mod.N_SYM, cell.nre, 2)
    return put_crs(grid, cell, sf_idx)


def decode(rx_grid, cfg: sch.SchConfig, cell: grid_mod.CellConfig, sf_idx: int,
           rnti: int, prb_mask: tuple, softbuf=None, max_iter: int = 8,
           codeword_q: int = 0, use_csi: bool = True):
    """Decode one PDSCH grant from a received subframe grid (B, 14, NRE, 2).

    Returns (payload bits (B, tbs), crc ok (B,), softbuf', ChestResult)."""
    re_idx = grid_mod.pdsch_re_indices(cell, sf_idx, prb_mask)
    ch = chest.estimate(rx_grid, cell, sf_idx)
    flat_rx = rx_grid.reshape(rx_grid.shape[:-3] + (grid_mod.N_SYM * cell.nre, 2))
    flat_ce = ch.ce.reshape(flat_rx.shape)
    y = jnp.take(flat_rx, jnp.asarray(re_idx), axis=-2)
    h = jnp.take(flat_ce, jnp.asarray(re_idx), axis=-2)
    x_eq, csi = chest.equalize_zf(y, h)
    llr = modem.demod_soft(x_eq, modem.MOD_FROM_QM[cfg.Qm])  # (B, G)
    if use_csi:
        qm = cfg.Qm
        w = jnp.repeat(csi, qm, axis=-1)
        llr = llr * w
    c_init = scrambling.pdsch_cinit(rnti, codeword_q, sf_idx, cell.cell_id)
    llr = scrambling.scramble_llrs(llr, c_init)
    payload, ok, softbuf, n_it = sch.decode_tb(llr, cfg, softbuf, max_iter)
    return payload, ok, softbuf, ch
