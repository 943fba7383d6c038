"""CP-OFDM modulation/demodulation over the matmul DFT.

Reference behavior: `lib/src/phy/dft/ofdm.c` — per-slot (de)modulation with
normal/extended CP, MBSFN support, optional fractional frequency shift
(ofdm.h:42-66).

Grid convention: a subframe resource grid is a cf tensor
(..., 14, NRE, 2) with NRE = 12*n_prb; subcarrier k maps to FFT bin
(k - NRE/2) mod N for the negative half and k - NRE/2 + 1 for the positive
half (DC punctured), per 36.211 §6.12.  Time-domain subframes are
(..., SF_LEN, 2) with SF_LEN = {1920, 3840, 7680, 15360, 23040, 30720}.

All 14 symbols FFT as one batched matmul; CP add/remove are static slices.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from . import dft

N_SYM_SF = 14  # normal CP


@functools.lru_cache(maxsize=None)
def params(n_prb: int, n_fft: int = None, cp: str = "normal"):
    """n_fft overrides the power-of-2 default — srsLTE's default "reduced"
    rates use 384/768/1152/1536 for 25/50/75/100 PRB (phy_common.c
    srslte_symbol_sz); captures recorded at those rates decode with the
    matching n_fft."""
    n = n_fft or dft.OFDM_SYMBOL_SZ[n_prb]
    if cp == "normal":
        cp0 = 160 * n // 2048
        cpl = 144 * n // 2048
        sf_len = 2 * (cp0 + n + 6 * (cpl + n))
        n_sym = 14
    else:  # extended CP: 6 symbols/slot, all CPs = N/4 (512@2048)
        cp0 = cpl = 512 * n // 2048
        sf_len = 2 * 6 * (cpl + n)
        n_sym = 12
    return dict(n=n, cp0=cp0, cp=cpl, sf_len=sf_len, nre=12 * n_prb,
                n_sym=n_sym)


@functools.lru_cache(maxsize=None)
def _bin_map(n_prb: int, n_fft: int = None) -> np.ndarray:
    p = params(n_prb, n_fft)
    nre, n = p["nre"], p["n"]
    k = np.arange(nre)
    return np.where(k < nre // 2, (k - nre // 2) % n, k - nre // 2 + 1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _symbol_starts(n_prb: int, cp: str = "normal") -> tuple:
    """(start, cp_len) of each OFDM symbol within the subframe."""
    p = params(n_prb, cp=cp)
    out = []
    t = 0
    for slot in range(2):
        for l in range(p["n_sym"] // 2):
            cpl = p["cp0"] if l == 0 else p["cp"]
            out.append((t, cpl))
            t += cpl + p["n"]
    assert t == p["sf_len"]
    return tuple(out)


def modulate(grid, n_prb: int, cp: str = "normal"):
    """Resource grid (..., n_sym, NRE, 2) -> time samples (..., SF_LEN, 2)."""
    p = params(n_prb, cp=cp)
    n, nre = p["n"], p["nre"]
    bins = _bin_map(n_prb)
    shape = grid.shape[:-3] + (p["n_sym"], n, 2)
    x = jnp.zeros(shape, grid.dtype)
    x = x.at[..., jnp.asarray(bins), :].set(grid)
    time = dft.idft(x)  # operates on axis -2: (..., n_sym, N, 2)
    pieces = []
    for l, (start, cpl) in enumerate(_symbol_starts(n_prb, cp)):
        sym = time[..., l, :, :]
        pieces.append(sym[..., n - cpl :, :])  # cyclic prefix
        pieces.append(sym)
    return jnp.concatenate(pieces, axis=-2)


def demodulate(samples, n_prb: int, cp: str = "normal"):
    """Time samples (..., SF_LEN, 2) -> resource grid (..., n_sym, NRE, 2)."""
    p = params(n_prb, cp=cp)
    n = p["n"]
    bins = _bin_map(n_prb)
    syms = []
    for start, cpl in _symbol_starts(n_prb, cp):
        syms.append(samples[..., start + cpl : start + cpl + n, :])
    x = jnp.stack(syms, axis=-3)  # (..., n_sym, N, 2)
    freq = dft.dft(x)
    return jnp.take(freq, jnp.asarray(bins), axis=-2)


# ---------------- MBSFN hybrid-CP subframes (ofdm.c mbsfn path) ----------------

N_SYM_MBSFN = 10  # extended-CP symbols after the 2-symbol non-MBSFN region


@functools.lru_cache(maxsize=None)
def mbsfn_layout(n_prb: int, n_fft: int = None):
    """(starts, cps) of the 2 normal-CP control symbols, the guard length,
    and the 10 extended-CP MBSFN symbols (ofdm.c:122-147)."""
    p = params(n_prb, n_fft)
    n = p["n"]
    cp_ext = 512 * n // 2048
    out = [(0, p["cp0"]), (p["cp0"] + n, p["cp"])]
    t = p["cp0"] + p["cp"] + 2 * n
    guard = 2 * cp_ext - p["cp0"] - p["cp"]
    t += guard
    mb = []
    for l in range(N_SYM_MBSFN):
        mb.append((t, cp_ext))
        t += cp_ext + n
    assert t == p["sf_len"], (t, p["sf_len"])
    return tuple(out), guard, tuple(mb)


def modulate_mbsfn(ctrl_grid, mbsfn_grid, n_prb: int):
    """(B, 2, NRE, 2) control (normal CP) + (B, 10, NRE, 2) MBSFN (ext CP)
    -> (B, SF_LEN, 2)."""
    p = params(n_prb)
    n = p["n"]
    bins = jnp.asarray(_bin_map(n_prb))
    ctrl_syms, guard, mb_syms = mbsfn_layout(n_prb)

    def to_time(grid):
        shape = grid.shape[:-2] + (n, 2)
        x = jnp.zeros(shape, grid.dtype)
        x = x.at[..., bins, :].set(grid)
        return dft.idft(x)

    tc = to_time(ctrl_grid)
    tm = to_time(mbsfn_grid)
    pieces = []
    for l, (start, cp) in enumerate(ctrl_syms):
        pieces.append(tc[..., l, n - cp :, :])
        pieces.append(tc[..., l, :, :])
    pieces.append(jnp.zeros(ctrl_grid.shape[:-3] + (guard, 2), ctrl_grid.dtype))
    for l, (start, cp) in enumerate(mb_syms):
        pieces.append(tm[..., l, n - cp :, :])
        pieces.append(tm[..., l, :, :])
    return jnp.concatenate(pieces, axis=-2)


def demodulate_mbsfn(samples, n_prb: int, n_fft: int = None):
    """-> (ctrl (B, 2, NRE, 2), mbsfn (B, 10, NRE, 2))."""
    p = params(n_prb, n_fft)
    n = p["n"]
    bins = jnp.asarray(_bin_map(n_prb, n_fft))
    ctrl_syms, _, mb_syms = mbsfn_layout(n_prb, n_fft)

    def grab(symlist):
        xs = [samples[..., s + cp : s + cp + n, :] for s, cp in symlist]
        x = jnp.stack(xs, axis=-3)
        return jnp.take(dft.dft(x), bins, axis=-2)

    return grab(ctrl_syms), grab(mb_syms)
