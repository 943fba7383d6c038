"""Channel simulator: fading statistics + PDSCH over EPA fading decodes."""

import jax
import numpy as np
import pytest

from srslte_emane_tpu.models import pdsch_link
from srslte_emane_tpu.ops import channel, cplx, fading
from srslte_emane_tpu.phch import grid as grid_mod


def test_profile_power_normalized():
    for p in ("epa", "eva", "etu"):
        d, a = fading.profile_taps(p, 30.72e6)
        assert abs(np.sum(a**2) - 1.0) < 1e-6
        assert (np.diff(d) >= 0).all()


def test_rayleigh_statistics():
    """Tap gains should be ~unit-power complex Gaussian over realizations."""
    g = fading.tap_gains(jax.random.PRNGKey(0), 1, np.zeros(1), 5.0, batch=4000)
    p = np.asarray(cplx.abs2(g)).ravel()
    assert abs(p.mean() - 1.0) < 0.1


def test_fading_evolves_with_doppler():
    key = jax.random.PRNGKey(1)
    t = np.array([0.0, 0.05])
    g = np.asarray(fading.tap_gains(key, 1, t, doppler_hz=100.0, batch=8))
    assert not np.allclose(g[:, 0], g[:, 1], atol=1e-3)
    # zero doppler -> static channel
    g0 = np.asarray(fading.tap_gains(key, 1, t, doppler_hz=0.0, batch=8))
    np.testing.assert_allclose(g0[:, 0], g0[:, 1], atol=1e-6)


def test_pdsch_over_epa_fading():
    """QPSK rate-0.3 over EPA + AWGN: the LS/linear-interp chest must track a
    frequency-selective channel well enough to decode."""
    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=25, cell_id=9, cfi=1),
        qm=2, code_rate=0.3, snr_db=20.0, sf_idx=1,
    )
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, (4, cfg.tbs), dtype=np.int8)
    tx = pdsch_link.tx_subframe(payload, cfg)
    srate = 1e3 * tx.shape[-2]
    faded, taps = fading.apply_fading(tx, jax.random.PRNGKey(2), "epa", srate,
                                      doppler_hz=5.0)
    rx = channel.awgn(jax.random.PRNGKey(3), faded, cfg.snr_db)
    out, ok, _, ch = pdsch_link.rx_subframe(rx, cfg)
    ok = np.asarray(ok)
    assert ok.mean() >= 0.75, f"fading decode ok rate {ok.mean()}"
    match = (np.asarray(out)[ok] == payload[ok]).all()
    assert match


def test_rlf_and_cfo_helpers():
    x = cplx.zeros((1, 100)) + 1.0
    assert np.asarray(fading.apply_rlf(x, 0.1)).sum() == 0  # inside outage
    assert np.asarray(fading.apply_rlf(x, 1.0)).sum() != 0
    y = fading.apply_cfo(x, 1000.0, 1.92e6)
    assert not np.allclose(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(np.asarray(cplx.abs2(y)), np.asarray(cplx.abs2(x)), atol=1e-4)
