"""Radio object (radio.cc role): gain/freq/srate management, continuous-tx
padding, loopback device."""

import numpy as np

from srslte_emane_tpu.utils import radio


def test_radio_loopback_gain_and_padding():
    r = radio.Radio(srate_hz=1.92e6)
    r.set_tx_gain(6.0)
    burst = np.ones((100, 2), np.float32) * 0.5
    r.tx(burst)  # at sample 0..99
    r.tx(burst, t_start_samples=300)  # gap 100..299 must be zero-padded
    rx = r.rx(400)
    np.testing.assert_allclose(rx[:100], burst * 10 ** (6 / 20), atol=1e-5)
    assert np.abs(rx[100:300]).max() == 0.0
    np.testing.assert_allclose(rx[300:400], burst * 10 ** (6 / 20), atol=1e-5)


def test_radio_cfo_roundtrip():
    r = radio.Radio(srate_hz=1.92e6)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 2)).astype(np.float32)
    r.set_tx_freq_offset(5000.0)
    r.set_rx_freq_offset(5000.0)  # receiver corrects the same offset
    r.tx(x)
    y = r.rx(256)
    np.testing.assert_allclose(y, x, atol=2e-3)


def test_radio_resample():
    r = radio.Radio(srate_hz=1.92e6)
    t = np.arange(1920) / 1.92e6
    x = np.stack([np.cos(2 * np.pi * 1e5 * t),
                  np.sin(2 * np.pi * 1e5 * t)], -1).astype(np.float32)
    y = r.resample_to(x, 3.84e6)
    assert abs(len(y) - 3840) <= 32
