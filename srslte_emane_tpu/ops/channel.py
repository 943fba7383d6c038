"""Channel models on device: AWGN (fading/delay/HST/RLF follow).

Reference behavior: `lib/src/phy/channel/` — ch_awgn.c, fading.c (EPA/EVA/ETU
tapped delay lines with Doppler), delay.c, hst.c, rlf.c, composed by
`srslte::channel`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import cplx


def awgn(key, x, snr_db, signal_power=None):
    """Add complex white Gaussian noise to cf tensor x at the given SNR.

    snr_db may be scalar or batched over leading dims.  signal_power: if None,
    measured from x (mean |x|^2 over all but leading batch dims)."""
    if signal_power is None:
        p = cplx.abs2(x)
        signal_power = jnp.mean(p.reshape(p.shape[0], -1), axis=-1)
        signal_power = signal_power.reshape((-1,) + (1,) * (x.ndim - 2))
    snr = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)
    snr = snr.reshape(snr.shape + (1,) * (x.ndim - 1 - snr.ndim))
    sigma2 = signal_power / snr  # total complex noise variance
    # per real component variance = sigma2/2
    noise = jax.random.normal(key, x.shape, x.dtype) * jnp.sqrt(sigma2 / 2.0)[..., None]
    return x + noise


def mimo_flat(key, tx, h, snr_db):
    """Flat-fading MIMO channel + AWGN.

    tx: (B, n_tx, T, 2) per-port time samples; h: (B, n_rx, n_tx, 2) cf flat
    channel.  Returns (B, n_rx, T, 2)."""
    from . import cplx

    # y[b,r,t,:] = sum_p h[b,r,p] * tx[b,p,t,:]
    y = jnp.sum(cplx.mul(h[:, :, :, None, :], tx[:, None, :, :, :]), axis=2)
    return awgn(key, y, snr_db)
