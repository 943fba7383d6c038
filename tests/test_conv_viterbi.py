"""Convolutional encoder + Viterbi decoder + conv rate matching."""

import numpy as np
import pytest

from srslte_emane_tpu.ops.fec import convcoder, viterbi


def conv_encode_host(bits):
    """Bit-serial oracle for the tail-biting encoder."""
    k = len(bits)
    out = np.zeros((3, k), dtype=np.int8)
    for t in range(k):
        for i in range(3):
            acc = 0
            for j in range(7):
                acc ^= int(convcoder.GENERATORS[i, j]) * int(bits[(t - j) % k])
            out[i, t] = acc & 1
    return out


@pytest.mark.parametrize("k", [40, 72, 140])
def test_conv_encode_matches_serial(k):
    rng = np.random.default_rng(k)
    bits = rng.integers(0, 2, size=(2, k), dtype=np.int8)
    enc = np.asarray(convcoder.conv_encode(bits))
    for b in range(2):
        np.testing.assert_array_equal(enc[b], conv_encode_host(bits[b]))


@pytest.mark.parametrize("k", [40, 120])
def test_viterbi_noiseless(k):
    rng = np.random.default_rng(k + 1)
    bits = rng.integers(0, 2, size=(4, k), dtype=np.int8)
    enc = np.asarray(convcoder.conv_encode(bits)).astype(np.float32)
    llrs = (1.0 - 2.0 * enc) * 8.0
    out = np.asarray(viterbi.viterbi_decode(llrs))
    np.testing.assert_array_equal(out, bits)


@pytest.mark.parametrize("snr_db", [0.0, 2.0])
def test_viterbi_awgn(snr_db):
    k = 40
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, size=(8, k), dtype=np.int8)
    enc = np.asarray(convcoder.conv_encode(bits)).astype(np.float32)
    sigma = 10 ** (-snr_db / 20)
    rx = (1.0 - 2.0 * enc) + rng.normal(0, sigma, enc.shape).astype(np.float32)
    out = np.asarray(viterbi.viterbi_decode(rx * (2 / sigma**2)))
    np.testing.assert_array_equal(out, bits)


@pytest.mark.parametrize("e_factor", [0.6, 1.0, 2.5])
def test_conv_rate_match_roundtrip(e_factor):
    k = 72
    rng = np.random.default_rng(int(e_factor * 10))
    bits = rng.integers(0, 2, size=(3, k), dtype=np.int8)
    enc = convcoder.conv_encode(bits)
    e = int(3 * k * e_factor)
    tx = np.asarray(convcoder.rate_match_cc(enc, e))
    assert tx.shape == (3, e)
    llr = (1.0 - 2.0 * tx).astype(np.float32)
    streams = np.asarray(convcoder.rate_unmatch_cc(llr, k + 0))
    # decode after derate-matching (punctured positions -> 0 LLR)
    out = np.asarray(viterbi.viterbi_decode(streams.reshape(3, 3, k)))
    if e_factor >= 1.0:
        np.testing.assert_array_equal(out, bits)
    else:
        # heavy puncturing: still mostly correct in noiseless conditions
        assert (out == bits).mean() > 0.95
