"""PMCH: MBSFN multicast channel (eMBMS).

Reference behavior: `lib/src/phy/phch/pmch.c` — a PDSCH variant carried in
the extended-CP MBSFN region with MBSFN reference signals
(refsignal_dl.c:363-381: c_init = 512(7(ns+1)+l+1)(2 N_mbsfn_id+1) +
N_mbsfn_id), scrambling c_init = floor(ns/2)*2^9 + N_mbsfn_area_id,
always full-bandwidth allocation.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..ops import cplx, modem, ofdm, sequence
from . import chest as chest_mod, grid as grid_mod, sch

# pilot layout inside the 10-symbol MBSFN region: 3 pilot symbols with
# frequency offsets (0, 1, 0), 6 pilots/PRB (every other subcarrier)
PILOT_SYMS = (0, 4, 8)
PILOT_FIDX = (0, 1, 0)


@functools.lru_cache(maxsize=None)
def mbsfn_rs(area_id: int, sf_idx: int, n_prb: int) -> np.ndarray:
    """(3, 6*n_prb) complex pilots for the 3 MBSFN-RS symbols."""
    out = np.zeros((3, 6 * n_prb), dtype=np.complex64)
    # pilots at extended-CP slot symbols l = 2 (slot 0) and l = 0, 4 (slot 1)
    slot_l = (2, 0, 4)
    for i, lsym in enumerate(PILOT_SYMS):
        ns = 2 * sf_idx + (0 if i == 0 else 1)
        lp = slot_l[i]
        c_init = (512 * (7 * (ns + 1) + lp + 1) * (2 * area_id + 1) + area_id) % (1 << 31)
        c = sequence.gold_sequence_host(c_init, 12 * grid_mod.MAX_PRB)
        m = np.arange(6 * n_prb)
        mp = m + 3 * (grid_mod.MAX_PRB - n_prb)
        out[i] = ((1 - 2 * c[2 * mp]) + 1j * (1 - 2 * c[2 * mp + 1])) / np.sqrt(2)
    return out


@functools.lru_cache(maxsize=None)
def pilot_k(n_prb: int):
    return tuple(PILOT_FIDX[i] + 2 * np.arange(6 * n_prb) for i in range(3))


@functools.lru_cache(maxsize=None)
def data_indices(n_prb: int):
    """Flat (sym*NRE + k) indices of PMCH data REs in the 10-sym region."""
    nre = 12 * n_prb
    res = np.zeros((ofdm.N_SYM_MBSFN, nre), dtype=bool)
    for i, l in enumerate(PILOT_SYMS):
        res[l, PILOT_FIDX[i] :: 2] = True
    idx = []
    for l in range(ofdm.N_SYM_MBSFN):
        ks = np.flatnonzero(~res[l])
        idx.append(l * nre + ks)
    return np.concatenate(idx).astype(np.int32)


def nof_re(n_prb: int) -> int:
    return len(data_indices(n_prb))


def encode(tb_bits, cfg: sch.SchConfig, n_prb: int, area_id: int, sf_idx: int):
    """-> MBSFN region grid (B, 10, NRE, 2) with PMCH + MBSFN-RS."""
    cw = sch.encode_tb(tb_bits, cfg)
    c_init = (sf_idx << 9) + area_id
    from ..ops import scrambling

    scr = scrambling.scramble_bits(cw, c_init)
    syms = modem.modulate(scr, modem.MOD_FROM_QM[cfg.Qm])
    B = syms.shape[0]
    nre = 12 * n_prb
    grid = cplx.zeros((B, ofdm.N_SYM_MBSFN, nre))
    flat = grid.reshape(B, -1, 2)
    flat = flat.at[:, jnp.asarray(data_indices(n_prb)), :].set(syms)
    grid = flat.reshape(B, ofdm.N_SYM_MBSFN, nre, 2)
    rs = mbsfn_rs(area_id, sf_idx, n_prb)
    for i, l in enumerate(PILOT_SYMS):
        v = cplx.from_numpy(rs[i])
        ks = jnp.asarray((PILOT_FIDX[i] + 2 * np.arange(6 * n_prb)).astype(np.int32))
        grid = grid.at[:, l, ks, :].set(jnp.broadcast_to(v, (B,) + v.shape))
    return grid


def decode(mbsfn_grid, cfg: sch.SchConfig, n_prb: int, area_id: int,
           sf_idx: int, max_iter: int = 8):
    """MBSFN-region grid -> (payload, ok)."""
    B = mbsfn_grid.shape[0]
    nre = 12 * n_prb
    rs = mbsfn_rs(area_id, sf_idx, n_prb)
    # LS at pilots, average over the 3 pilot symbols, freq linear interp
    h_syms = []
    for i, l in enumerate(PILOT_SYMS):
        ks = jnp.asarray((PILOT_FIDX[i] + 2 * np.arange(6 * n_prb)).astype(np.int32))
        y = jnp.take(mbsfn_grid[:, l], ks, axis=-2)
        h_syms.append(cplx.mul_conj(y, jnp.asarray(cplx.from_numpy(rs[i]))))
    h_p = sum(h_syms) / len(h_syms)  # (B, 6*n_prb, 2) at even subcarriers
    # interp pilots (spacing 2, offset 0) to all NRE: linear + edge extrap
    npil = 6 * n_prb
    m = np.zeros((nre, npil), dtype=np.float32)
    for k in range(nre):
        j = k / 2.0
        j0 = int(min(np.floor(j), npil - 2))
        t = j - j0
        m[k, j0] = 1 - t
        m[k, j0 + 1] = t
    ce = jnp.einsum("kp,...pc->...kc", jnp.asarray(m), h_p)  # (B, NRE, 2)
    ce_full = jnp.broadcast_to(ce[:, None], (B, ofdm.N_SYM_MBSFN, nre, 2))
    flat = mbsfn_grid.reshape(B, -1, 2)
    flat_ce = ce_full.reshape(B, -1, 2)
    idx = jnp.asarray(data_indices(n_prb))
    y = jnp.take(flat, idx, axis=-2)
    h = jnp.take(flat_ce, idx, axis=-2)
    x_eq, csi = chest_mod.equalize_zf(y, h)
    llr = modem.demod_soft(x_eq, modem.MOD_FROM_QM[cfg.Qm])
    llr = llr * jnp.repeat(csi, cfg.Qm, axis=-1)
    from ..ops import scrambling

    llr = scrambling.scramble_llrs(llr, (sf_idx << 9) + area_id)
    payload, ok, _, _ = sch.decode_tb(llr, cfg, max_iter=max_iter)
    return payload, ok
