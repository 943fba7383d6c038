"""SRS: uplink sounding reference signal (36.211 §5.5.3).

Reference behavior: srsLTE generates SRS within `refsignal_ul.c` (r_SRS from
the same base sequences) and `ue_ul.c`/`enb_ul.c` place/extract it on the
last SC-FDMA symbol with transmission comb 2.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..ops import cplx
from . import grid as grid_mod, refsignal_ul

SRS_SYMBOL = 13  # last symbol of the subframe


@functools.lru_cache(maxsize=None)
def srs_sequence(cell_id: int, sf_idx: int, m_srs_prb: int, cyclic_shift: int,
                 comb: int) -> np.ndarray:
    """(m_srs_prb*6,) complex: comb-2 SRS over m_srs_prb PRBs."""
    m_sc = 6 * m_srs_prb  # every other subcarrier
    # base sequence length must be a valid RS size: use m_sc (multiple of 6?)
    # 36.211: r_SRS = r_uv of length M_sc_RS = m_srs/2 subcarriers
    u = (cell_id % 30)
    base_len = m_sc if m_sc in (12, 24) or m_sc >= 36 else 12
    r = refsignal_ul.base_sequence(u, 0, max(12, m_sc))[:m_sc]
    alpha = 2 * np.pi * cyclic_shift / 8.0
    return (r * np.exp(1j * alpha * np.arange(m_sc))).astype(np.complex64)


def put_srs(grid, cell: grid_mod.CellConfig, sf_idx: int, rb_start: int,
            m_srs_prb: int, cyclic_shift: int = 0, comb: int = 0):
    """Place SRS on the last symbol, comb-2."""
    seq = srs_sequence(cell.cell_id, sf_idx, m_srs_prb, cyclic_shift, comb)
    ks = (12 * rb_start + comb + 2 * np.arange(6 * m_srs_prb)).astype(np.int32)
    B = grid.shape[0]
    v = cplx.from_numpy(seq)
    flat = grid.reshape(B, -1, 2)
    idx = SRS_SYMBOL * cell.nre + ks
    flat = flat.at[:, jnp.asarray(idx), :].set(jnp.broadcast_to(v, (B,) + v.shape))
    return flat.reshape(grid.shape)


def estimate_srs(rx_grid, cell: grid_mod.CellConfig, sf_idx: int, rb_start: int,
                 m_srs_prb: int, cyclic_shift: int = 0, comb: int = 0):
    """eNB-side wideband channel estimate + SNR from SRS.
    Returns (h (B, 6*m_srs, 2), snr_db (B,))."""
    seq = srs_sequence(cell.cell_id, sf_idx, m_srs_prb, cyclic_shift, comb)
    ks = (12 * rb_start + comb + 2 * np.arange(6 * m_srs_prb)).astype(np.int32)
    B = rx_grid.shape[0]
    flat = rx_grid.reshape(B, -1, 2)
    idx = SRS_SYMBOL * cell.nre + ks
    y = jnp.take(flat, jnp.asarray(idx), axis=-2)
    h = cplx.mul_conj(y, jnp.asarray(cplx.from_numpy(seq)))
    # noise from neighbor-difference residual
    d = h[:, 1:, :] - h[:, :-1, :]
    noise = jnp.mean(cplx.abs2(d), axis=-1) / 2.0
    p = jnp.mean(cplx.abs2(h), axis=-1)
    snr = 10.0 * jnp.log10(jnp.maximum(p / jnp.maximum(noise, 1e-12), 1e-12))
    return h, snr
