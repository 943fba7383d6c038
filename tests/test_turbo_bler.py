"""Turbo decoder BLER waterfall position: rate-1/3 K=6144, 8 iterations
must clear the waterfall by Eb/N0 ~ 1.5 dB (literature ~0.8-1.2 dB for
full log-MAP; max-log-MAP costs ~0.2-0.3 dB) and fail hard at -2 dB."""

import numpy as np

from srslte_emane_tpu.ops.fec import crc as crc_mod, turbo, turbodecoder


def _run(snr_db, n_blocks=8, k=6144, llr_bits=32):
    rng = np.random.default_rng(42)
    payload = rng.integers(0, 2, (n_blocks, k - 24), dtype=np.int8)
    bits = np.asarray(crc_mod.crc_attach(payload, crc_mod.LTE_CRC24B))
    d0, d1, d2 = (np.asarray(x).astype(np.float32)
                  for x in turbo.turbo_encode(bits))
    # rate 1/3: Es/N0 = Eb/N0 + 10log10(1/3) for BPSK
    esn0 = snr_db + 10 * np.log10(1 / 3)
    sigma = 10 ** (-esn0 / 20) / np.sqrt(2)

    def llr(d):
        x = 1 - 2.0 * d
        y = x + rng.normal(0, sigma, d.shape)
        return (2 * y / sigma**2).astype(np.float32)

    out, ok, _ = turbodecoder.turbo_decode(
        llr(d0), llr(d1), llr(d2), np.ones(n_blocks, bool), k, 8,
        crc_mod.LTE_CRC24B, llr_bits=llr_bits)
    return np.asarray(ok)


def test_waterfall_cleared_at_1p5_db():
    ok = _run(1.5)
    assert ok.all(), ok


def test_fails_well_below_capacity():
    ok = _run(-2.0)
    assert not ok.any(), ok


def test_quantized_llr_modes_hold_the_waterfall():
    """The reference's 8/16-bit decoder modes (turbodecoder.h
    SRSLTE_TDEC_8BIT/16BIT) as precision contracts: with LLR inputs
    quantized to the 8-bit (and 16-bit) dynamic range, the waterfall
    still clears at 1.5 dB — the quantization loss is within the
    max-log-MAP margin, matching the reference's SIMD-mode behavior."""
    for bits in (16, 8):
        ok = _run(1.5, llr_bits=bits)
        assert ok.all(), (bits, ok)
    # the quantizers really saturate (8-bit clips at |q| = 127/scale)
    import jax.numpy as jnp

    q = np.asarray(turbodecoder.quantize_llr_int8(jnp.asarray([100.0, -3.0])))
    assert q[0] == 127 / 8.0 and q[1] == -3.0
