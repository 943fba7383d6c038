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


def test_radio_multichannel():
    """Multi-channel radio (radio.cc rf_buffer_t / carrier mapping): two
    independent streams with per-channel gain; rx stacks (N, T, 2)."""
    import numpy as np

    from srslte_emane_tpu.utils import radio as radio_mod

    r = radio_mod.Radio(nof_channels=2)
    assert r.nof_channels == 2
    r.set_tx_gain(6.0, channel=1)  # only channel 1 amplified
    a = np.ones((100, 2), np.float32) * 0.5
    b = np.ones((100, 2), np.float32) * 0.25
    r.tx([a, b])
    y = r.rx(100)
    assert y.shape == (2, 100, 2)
    np.testing.assert_allclose(y[0], 0.5, atol=1e-6)
    np.testing.assert_allclose(y[1], 0.25 * 10 ** (6 / 20), rtol=1e-5)
    # single-channel addressing + carrier mapping
    r.tx(a * 0.1, channel=0)
    y0 = r.rx(100, channel=0)
    np.testing.assert_allclose(y0, 0.05, atol=1e-6)
    assert r.channel_of_carrier(1) == 1
    r.carrier_map[1] = 0  # SCell mapped onto channel 0
    assert r.channel_of_carrier(1) == 0
