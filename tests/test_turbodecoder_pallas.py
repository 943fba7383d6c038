"""Pallas MAP kernels vs the XLA-scan reference path (interpret mode on CPU)."""

import numpy as np
import pytest

from srslte_emane_tpu.ops.fec import (turbo, turbodecoder, turbodecoder_pallas,
                                      turbodecoder_pallas2)


def _map_inputs(k, B=4):
    rng = np.random.default_rng(k)
    bits = rng.integers(0, 2, (B, k), dtype=np.int8)
    d0, d1, d2 = (np.asarray(x).astype(np.float32) for x in turbo.turbo_encode(bits))
    scale = 4.0
    ls = ((1 - 2.0 * d0[:, :k]) * scale + rng.normal(0, 1, (B, k))).astype(np.float32)
    lp = ((1 - 2.0 * d1[:, :k]) * scale + rng.normal(0, 1, (B, k))).astype(np.float32)
    tail_x = ((1 - 2.0 * np.stack([d0[:, k], d2[:, k], d1[:, k + 1]], -1)) * scale).astype(np.float32)
    tail_z = ((1 - 2.0 * np.stack([d1[:, k], d0[:, k + 1], d2[:, k + 1]], -1)) * scale).astype(np.float32)
    return ls, lp, tail_x, tail_z


@pytest.mark.parametrize("k", [512, 2048])
def test_pallas_map_matches_xla(k):
    ls, lp, tail_x, tail_z = _map_inputs(k)
    ref = np.asarray(turbodecoder._map_decode(ls, lp, tail_x, tail_z))
    got = np.asarray(turbodecoder_pallas.map_decode_pallas(
        ls, lp, tail_x, tail_z, interpret=True))
    # normalization points differ; LLRs are normalization-invariant
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("k", [512, 2048, 5504])
def test_pallas2_map_matches_xla(k):
    # 5504 is a bench-of-record CB size (W=32, L=172)
    ls, lp, tail_x, tail_z = _map_inputs(k, B=2 if k > 4096 else 4)
    ref = np.asarray(turbodecoder._map_decode(ls, lp, tail_x, tail_z))
    got = np.asarray(turbodecoder_pallas2.map_decode_pallas2(
        ls, lp, tail_x, tail_z, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("k", [512, 5504])
def test_pallas2_narrow_mode(k):
    """bf16-storage mode (llr_bits<=16 on TPU): recursions stay f32, so the
    posteriors track the f32 kernel to bf16 rounding; hard decisions must
    agree wherever the f32 LLR is non-marginal."""
    ls, lp, tail_x, tail_z = _map_inputs(k, B=2)
    ref = np.asarray(turbodecoder_pallas2.map_decode_pallas2(
        ls, lp, tail_x, tail_z, interpret=True))
    got = np.asarray(turbodecoder_pallas2.map_decode_pallas2(
        ls, lp, tail_x, tail_z, interpret=True, narrow=True))
    # bf16 has ~2-3 decimal digits: allow |err| ~ 1% of the LLR range
    np.testing.assert_allclose(got, ref, atol=0.3, rtol=0.02)
    strong = np.abs(ref) > 0.5
    assert (np.sign(got[strong]) == np.sign(ref[strong])).all()


def test_turbo_decode_use_pallas_flag():
    """Full turbo_decode with the Pallas MAP (interpreter on CPU), tiny CB."""
    import numpy as np

    from srslte_emane_tpu.ops.fec import crc as crc_mod, turbo, turbodecoder

    k = 40
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 2, (2, k - 24), dtype=np.int8)
    bits = np.asarray(crc_mod.crc_attach(payload, crc_mod.LTE_CRC24B))
    d0, d1, d2 = (np.asarray(x).astype(np.float32) for x in turbo.turbo_encode(bits))
    llr = lambda d: ((1 - 2.0 * d) * 8).astype(np.float32)
    out, ok, _ = turbodecoder.turbo_decode(
        llr(d0), llr(d1), llr(d2), np.ones(2, bool), k, 4,
        crc_mod.LTE_CRC24B, True)
    assert np.asarray(ok).all()
    assert (np.asarray(out) == bits).all()
