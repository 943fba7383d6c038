"""PRACH preamble generation + detection."""

import jax
import numpy as np

from srslte_emane_tpu.ops import channel, cplx
from srslte_emane_tpu.phch import prach


def test_preamble_unit_power_and_distinct():
    tbl = prach.preamble_freq_table(0, 1)
    # ZC freq domain: |X[k]|^2 == N_zc
    np.testing.assert_allclose(np.abs(tbl[0]) ** 2, prach.N_ZC, rtol=1e-3)
    assert not np.allclose(tbl[0], tbl[1])


def test_detect_clean():
    idx = np.array([0, 5, 17, 63])
    p = prach.gen(idx, 0, 1)
    det, metric, toff = prach.detect(p, 0, 1)
    det = np.asarray(det).copy()
    assert det[np.arange(4), idx].all()
    # no cross-detections
    det[np.arange(4), idx] = False
    assert not det.any()
    assert (np.asarray(toff)[np.arange(4), idx] == 0).all()


def test_detect_noisy_with_delay():
    rng = np.random.default_rng(1)
    idx = np.array([3, 40])
    p = np.asarray(prach.gen(idx, 6, 2))
    # apply integer delay d=5 (phase ramp in freq) + AWGN
    d = 5
    k = np.arange(prach.N_ZC)
    ramp = np.exp(-1j * 2 * np.pi * k * d / prach.N_ZC)
    pc = cplx.to_numpy(p) * ramp
    pc = pc + (rng.normal(0, 0.7, pc.shape) + 1j * rng.normal(0, 0.7, pc.shape))
    rx = cplx.from_numpy(pc.astype(np.complex64))
    det, metric, toff = prach.detect(rx, 6, 2, threshold=8.0)
    det = np.asarray(det).copy()
    assert det[np.arange(2), idx].all()
    assert (np.asarray(toff)[np.arange(2), idx] == d).all()
    det[np.arange(2), idx] = False
    assert not det.any()
