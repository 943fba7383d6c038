"""PMCH/MBSFN: hybrid-CP subframe roundtrip + multicast channel decode."""

import jax
import numpy as np

from srslte_emane_tpu.ops import channel, cplx, ofdm
from srslte_emane_tpu.phch import pmch, sch


def test_mbsfn_ofdm_roundtrip():
    rng = np.random.default_rng(0)
    n_prb = 25
    ctrl = rng.normal(size=(2, 2, 12 * n_prb, 2)).astype(np.float32)
    mb = rng.normal(size=(2, 10, 12 * n_prb, 2)).astype(np.float32)
    t = ofdm.modulate_mbsfn(ctrl, mb, n_prb)
    assert t.shape[-2] == ofdm.params(n_prb)["sf_len"]
    c2, m2 = ofdm.demodulate_mbsfn(t, n_prb)
    # bf16 DFT inputs: worst-case element error ~1.5% (RMS -52 dB)
    np.testing.assert_allclose(np.asarray(c2), ctrl, atol=3e-2)
    np.testing.assert_allclose(np.asarray(m2), mb, atol=3e-2)


def test_pmch_decode_awgn():
    n_prb, area_id, sf_idx = 25, 1, 3
    n_re = pmch.nof_re(n_prb)
    qm = 2
    tbs = (n_re * qm // 3) // 8 * 8
    cfg = sch.SchConfig(tbs=tbs, G=n_re * qm, Qm=qm, Nl=1)
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 2, (2, tbs), dtype=np.int8)
    mb = pmch.encode(payload, cfg, n_prb, area_id, sf_idx)
    ctrl = cplx.zeros((2, 2, 12 * n_prb))
    t = ofdm.modulate_mbsfn(ctrl, mb, n_prb)
    rx = channel.awgn(jax.random.PRNGKey(0), t, 10.0)
    _, mb_rx = ofdm.demodulate_mbsfn(rx, n_prb)
    out, ok = pmch.decode(mb_rx, cfg, n_prb, area_id, sf_idx)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), payload)
