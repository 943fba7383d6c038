"""Turbo decoder + rate matching: encode -> rate match -> (AWGN) -> de-rate
match -> decode roundtrips, bit-exact on decoded payloads."""

import numpy as np
import pytest

from srslte_emane_tpu.ops.fec import crc as crc_mod
from srslte_emane_tpu.ops.fec import rm_turbo, turbo, turbodecoder


def _encode_with_crc(rng, b, k, crc=crc_mod.LTE_CRC24B):
    """Random payload + CRC so the decoder's early stop has something to check."""
    payload = rng.integers(0, 2, size=(b, k - crc[1]), dtype=np.int8)
    bits = np.asarray(crc_mod.crc_attach(payload, crc))
    return bits


def _llrs_from_bits(bits, rng, snr_db=None, scale=8.0):
    """Bipolar mapping (positive LLR = bit 0) with optional AWGN."""
    sym = (1.0 - 2.0 * bits).astype(np.float32)
    if snr_db is None:
        return sym * scale
    sigma = 10 ** (-snr_db / 20)
    noisy = sym + rng.normal(0, sigma, sym.shape).astype(np.float32)
    return noisy * (2.0 / sigma**2)


@pytest.mark.parametrize("k", [40, 512])
def test_turbo_decode_noiseless(k):
    rng = np.random.default_rng(k)
    bits = _encode_with_crc(rng, 4, k)
    d = turbo.turbo_encode(bits)
    llr = [_llrs_from_bits(np.asarray(x), rng) for x in d]
    out, ok, it = turbodecoder.turbo_decode(
        llr[0], llr[1], llr[2], np.ones(4, bool), k, 8
    )
    assert bool(np.all(np.asarray(ok)))
    np.testing.assert_array_equal(np.asarray(out), bits)
    assert int(it) == 1  # CRC early stop on first iteration


@pytest.mark.parametrize("k,snr_db", [(104, 2.0), (1024, 1.5), (6144, 1.5)])
def test_turbo_decode_awgn(k, snr_db):
    rng = np.random.default_rng(k)
    bits = _encode_with_crc(rng, 8, k)
    d = turbo.turbo_encode(bits)
    llr = [_llrs_from_bits(np.asarray(x), rng, snr_db=snr_db) for x in d]
    out, ok, it = turbodecoder.turbo_decode(
        llr[0], llr[1], llr[2], np.ones(8, bool), k, 8
    )
    # rate 1/3 at these SNRs decodes comfortably
    assert bool(np.all(np.asarray(ok))), f"iter={int(it)}"
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_rm_tx_rv0_prefix_properties():
    """rv0 selection must start at k0 = 2R and skip dummies/fillers."""
    k, f = 104, 0
    w = rm_turbo.wbuf_map(k, f)
    assert len(w) == rm_turbo.wbuf_size(k)
    # every non-negative entry appears exactly once
    vals = w[w >= 0]
    assert len(np.unique(vals)) == len(vals) == 3 * (k + 4) - (0 if f == 0 else 2 * f)
    e = 3 * (k + 4) + 17  # force wraparound
    tbl = rm_turbo.tx_table(k, f, e, 0)
    # wraparound repeats earliest entries
    assert tbl[0] != -1 and len(tbl) == e


@pytest.mark.parametrize("k,f", [(104, 0), (136, 10), (6144, 0)])
@pytest.mark.parametrize("rv", [0, 2])
def test_rate_match_roundtrip_decode(k, f, rv):
    """encode -> rate match (puncture ~1/2) -> de-rate match -> decode."""
    rng = np.random.default_rng(k * 7 + rv)
    B = 4
    payload = rng.integers(0, 2, size=(B, k - 24 - f), dtype=np.int8)
    bits_nf = np.asarray(crc_mod.crc_attach(payload, crc_mod.LTE_CRC24B))
    bits = np.concatenate([np.zeros((B, f), np.int8), bits_nf], axis=1)
    assert bits.shape[1] == k
    d = turbo.turbo_encode(bits)
    d_flat = np.concatenate([np.asarray(x) for x in d], axis=1)  # (B, 3(k+4))
    e = 2 * k  # rate ~1/2 after matching
    tx = np.asarray(rm_turbo.rate_match_tx(d_flat, k, f, e, rv))
    llr = _llrs_from_bits(tx, rng, snr_db=None)
    wbuf = np.zeros((B, rm_turbo.wbuf_size(k)), np.float32)
    wbuf = rm_turbo.rate_unmatch_rx(llr, wbuf, k, f, e, rv)
    l0, l1, l2 = rm_turbo.wbuf_to_d_llrs(wbuf, k, f)
    out, ok, _ = turbodecoder.turbo_decode(
        np.asarray(l0), np.asarray(l1), np.asarray(l2), np.ones(B, bool), k, 8
    )
    assert bool(np.all(np.asarray(ok)))
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_harq_soft_combining_two_rvs():
    """rv0 at low rate fails alone at very high puncturing; rv0+rv2 combine."""
    k = 1024
    rng = np.random.default_rng(3)
    B = 2
    payload = rng.integers(0, 2, size=(B, k - 24), dtype=np.int8)
    bits = np.asarray(crc_mod.crc_attach(payload, crc_mod.LTE_CRC24B))
    d = turbo.turbo_encode(bits)
    d_flat = np.concatenate([np.asarray(x) for x in d], axis=1)
    e = int(k * 1.1)  # heavy puncturing, near capacity at low SNR
    snr = 2.0
    wbuf = np.zeros((B, rm_turbo.wbuf_size(k)), np.float32)
    for rv in (0, 2):
        tx = np.asarray(rm_turbo.rate_match_tx(d_flat, k, 0, e, rv))
        llr = _llrs_from_bits(tx, rng, snr_db=snr)
        wbuf = np.asarray(rm_turbo.rate_unmatch_rx(llr, wbuf, k, 0, e, rv))
    l0, l1, l2 = rm_turbo.wbuf_to_d_llrs(wbuf, k, 0)
    out, ok, _ = turbodecoder.turbo_decode(
        np.asarray(l0), np.asarray(l1), np.asarray(l2), np.ones(B, bool), k, 8
    )
    assert bool(np.all(np.asarray(ok)))
    np.testing.assert_array_equal(np.asarray(out), bits)
