"""DFT/IDFT as MXU matmuls (the `lib/src/phy/dft/dft_fftw.c` replacement).

Reference behavior: FFTW3 single-precision plans with wisdom caching
(dft_fftw.c:34-56).

TPU design: LTE sizes are small (OFDM: 128..2048; SC-FDMA transform precoding:
12..1296), and the batch is huge (14 symbols x subframes x cells), so a dense
DFT matrix multiply runs the transform on the MXU at full utilisation — a
(B, N) @ (N, N) complex product expressed as four real f32 matmuls.  This is
both faster in practice at these sizes than a serial FFT butterfly network
and, critically, works on backends without an XLA FFT lowering.  The DFT
matrices are host-generated per size ("the plan") and lifted as compile-time
constants ("the wisdom").

For N > 2048 or tight-memory settings a two-stage Cooley-Tukey (matmul -
twiddle - matmul) would cut FLOPs ~sqrt(N)-fold; LTE never needs it.
"""

from __future__ import annotations

import functools

import numpy as np

from . import cplx

OFDM_SYMBOL_SZ = {6: 128, 15: 256, 25: 512, 50: 1024, 75: 1536, 100: 2048}


@functools.lru_cache(maxsize=None)
def _dft_matrices(n: int, inverse: bool, ortho: bool):
    k = np.arange(n)
    sign = 2j if inverse else -2j
    m = np.exp(sign * np.pi * np.outer(k, k) / n)
    if ortho:
        m = m / np.sqrt(n)
    elif inverse:
        m = m / n
    return m.real.astype(np.float32), m.imag.astype(np.float32)


def dft(x, n: int = None, inverse: bool = False, ortho: bool = True):
    """cf tensor (..., N, 2) -> DFT along axis -2.  ortho: 1/sqrt(N) both ways
    (keeps grid/time powers equal); else forward unscaled, inverse 1/N.

    Inputs round to bf16 with f32 accumulation: 2x the MXU rate on TPU at
    roundtrip EVM ~ -52 dB (measured; 256QAM needs ~ -32 dB)."""
    import jax

    n = x.shape[-2] if n is None else n
    w_re, w_im = _dft_matrices(n, inverse, ortho)
    # (..., N, 2) -> treat N as contraction dim: out[..., m] = sum_k x[k] W[k, m]
    import jax.numpy as jnp

    xr = x[..., 0].astype(jnp.bfloat16)
    xi = x[..., 1].astype(jnp.bfloat16)
    wr = jnp.asarray(w_re, jnp.bfloat16)
    wi = jnp.asarray(w_im, jnp.bfloat16)
    nd = xr.ndim
    dims = (((nd - 1,), (0,)), ((), ()))
    mm = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=dims, preferred_element_type=jnp.float32)
    out_r = mm(xr, wr) - mm(xi, wi)
    out_i = mm(xr, wi) + mm(xi, wr)
    return cplx.make(out_r, out_i)


def idft(x, n: int = None, ortho: bool = True):
    return dft(x, n, inverse=True, ortho=ortho)


def dft_host(x: np.ndarray, inverse: bool = False, ortho: bool = True) -> np.ndarray:
    """NumPy oracle via np.fft."""
    norm = "ortho" if ortho else None
    fn = np.fft.ifft if inverse else np.fft.fft
    return fn(x, axis=-1, norm=norm).astype(np.complex64)
