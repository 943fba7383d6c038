"""Native C++ runtime core vs the NumPy reference path."""

import numpy as np
import pytest

from srslte_emane_tpu.runtime import native_bus, sinr

pytestmark = pytest.mark.skipif(not native_bus.available(),
                                reason="native toolchain unavailable")


def test_native_sinr_matches_numpy():
    rng = np.random.default_rng(0)
    T, R, P = 5, 4, 50
    tx = rng.uniform(-10, 20, T)
    used = (rng.random((T, P)) < 0.5).astype(np.float32)
    pl = rng.uniform(60, 120, (T, R)).astype(np.float32)
    ref = sinr.per_rb_sinr(tx, used, pl, -110.0)
    nat = native_bus.sinr_per_rb_native(tx, used, pl, -110.0)
    np.testing.assert_allclose(nat, ref, rtol=2e-3, atol=1e-2)


def test_native_bus_queues():
    bus = native_bus.NativeBus()
    bus.send(0, [1, 2], b"hello")
    bus.send(1, [2], b"world!")
    assert bus.recv(1) == [(0, b"hello")]
    got = bus.recv(2)
    assert got == [(0, b"hello"), (1, b"world!")]
    assert bus.recv(2) == []
    assert bus.step_tti() == 1


def test_native_sinr_speed_large_network():
    """200 tx x 200 rx x 100 PRB adjudication stays sub-10ms in C++."""
    import time

    rng = np.random.default_rng(1)
    T = R = 200
    P = 100
    tx = rng.uniform(0, 10, T)
    used = np.ones((T, P), np.float32)
    pl = rng.uniform(60, 140, (T, R)).astype(np.float32)
    native_bus.sinr_per_rb_native(tx, used, pl, -110.0)  # warm
    t0 = time.time()
    native_bus.sinr_per_rb_native(tx, used, pl, -110.0)
    dt = time.time() - t0
    assert dt < 0.1, f"native SINR too slow: {dt*1e3:.1f} ms"
