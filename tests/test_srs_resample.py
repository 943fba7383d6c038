"""SRS, resampling, AGC."""

import jax
import numpy as np

from srslte_emane_tpu.ops import channel, cplx, ofdm, resample
from srslte_emane_tpu.phch import grid as grid_mod, srs


def test_srs_roundtrip():
    cell = grid_mod.CellConfig(n_prb=25, cell_id=88)
    g = cplx.zeros((2, 14, cell.nre))
    g = srs.put_srs(g, cell, 2, rb_start=4, m_srs_prb=16, cyclic_shift=2)
    t = ofdm.modulate(g, cell.n_prb)
    rx = channel.awgn(jax.random.PRNGKey(0), t, 20.0)
    rg = ofdm.demodulate(rx, cell.n_prb)
    h, snr = srs.estimate_srs(rg, cell, 2, 4, 16, cyclic_shift=2)
    # flat channel -> h ~ 1+0j, good SNR
    hm = np.asarray(h)
    assert abs(hm[..., 0].mean() - 1.0) < 0.1
    assert np.asarray(snr).min() > 10


def test_resample_arb_tone():
    """Resampling a complex tone preserves its frequency."""
    fs_in, fs_out = 1.92e6, 3.84e6
    f0 = 100e3
    t = np.arange(1920) / fs_in
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    y = cplx.to_numpy(resample.resample_arb(cplx.from_numpy(x[None]), fs_out / fs_in))
    n = len(y[0])
    spec = np.abs(np.fft.fft(y[0, 100:-100] * np.hanning(n - 200)))
    peak = np.argmax(spec)
    freq = peak / (n - 200) * fs_out
    assert abs(freq - f0) < 3e3, freq


def test_interp_and_decim():
    x = cplx.from_numpy(np.arange(10, dtype=np.complex64)[None])
    up = np.asarray(resample.interp_linear(x, 2))
    assert abs(up[0, 1, 0] - 0.5) < 1e-6
    down = np.asarray(resample.decimate(jax.numpy.asarray(up), 2))
    # pairs average to k + 0.25 (except the clamped last sample)
    np.testing.assert_allclose(down[0, :-1, 0], np.arange(9) + 0.25, atol=1e-5)


def test_agc_converges():
    rng = np.random.default_rng(0)
    agc = resample.Agc(target=1.0)
    x = cplx.from_numpy((0.01 * (rng.normal(size=512) + 1j * rng.normal(size=512))).astype(np.complex64)[None])
    for _ in range(20):
        y = agc.process(x)
    p = float(np.mean(np.asarray(cplx.abs2(y))))
    assert 0.5 < p < 2.0, p
