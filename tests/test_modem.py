"""Modulation tables, soft demod, scrambling."""

import numpy as np
import pytest

from srslte_emane_tpu.ops import modem, scrambling, sequence


@pytest.mark.parametrize("mod", ["bpsk", "qpsk", "16qam", "64qam", "256qam"])
def test_constellation_unit_power(mod):
    pts = modem.constellation(mod)
    np.testing.assert_allclose(np.mean(np.abs(pts) ** 2), 1.0, rtol=1e-6)
    # Gray property: adjacent-in-I/Q points differ by 1 bit is implied by the
    # closed forms; check uniqueness instead
    assert len(np.unique(pts.round(6))) == len(pts)


def test_qpsk_spec_points():
    # 36.211 Table 7.1.2-1
    pts = modem.constellation("qpsk") * np.sqrt(2)
    np.testing.assert_allclose(pts, [1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j], atol=1e-6)


def test_16qam_spec_points():
    pts = modem.constellation("16qam") * np.sqrt(10)
    # b=0000 -> 1+1j; b=0001 -> 1+3j; b=0010 -> 3+1j; b=1111 -> -3-3j
    np.testing.assert_allclose(pts[0b0000], 1 + 1j, atol=1e-6)
    np.testing.assert_allclose(pts[0b0001], 1 + 3j, atol=1e-6)
    np.testing.assert_allclose(pts[0b0010], 3 + 1j, atol=1e-6)
    np.testing.assert_allclose(pts[0b1111], -3 - 3j, atol=1e-6)


@pytest.mark.parametrize("mod", ["bpsk", "qpsk", "16qam", "64qam", "256qam"])
def test_mod_demod_roundtrip(mod):
    qm = modem.BITS_PER_SYMBOL[mod]
    rng = np.random.default_rng(qm)
    bits = rng.integers(0, 2, size=(3, 120 * qm), dtype=np.int8)
    syms = modem.modulate(bits, mod)
    assert syms.shape == (3, 120, 2)
    hard = np.asarray(modem.demod_hard(syms, mod))
    np.testing.assert_array_equal(hard, bits)


@pytest.mark.parametrize("mod", ["qpsk", "16qam", "64qam", "256qam"])
def test_demod_soft_with_noise(mod):
    qm = modem.BITS_PER_SYMBOL[mod]
    rng = np.random.default_rng(qm + 10)
    bits = rng.integers(0, 2, size=(2, 600 * qm), dtype=np.int8)
    syms = np.asarray(modem.modulate(bits, mod))
    sigma = 0.01 if mod == "256qam" else 0.02
    noisy = (syms + rng.normal(0, sigma, syms.shape)).astype(np.float32)
    llrs = np.asarray(modem.demod_soft(noisy, mod))
    np.testing.assert_array_equal((llrs < 0).astype(np.int8), bits)


def test_scrambling_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(2, 384), dtype=np.int8)
    cinits = np.array(
        [scrambling.pdsch_cinit(0x46, 0, 3, 301), scrambling.pdsch_cinit(0x47, 1, 0, 2)],
        dtype=np.uint32,
    )
    scr = np.asarray(scrambling.scramble_bits(bits, cinits))
    assert not np.array_equal(scr, bits)
    unscr = np.asarray(scrambling.scramble_bits(scr, cinits))
    np.testing.assert_array_equal(unscr, bits)
    # LLR descramble consistency: descrambled LLRs of scrambled bits == bipolar bits
    llrs = (1.0 - 2.0 * scr).astype(np.float32)
    descr = np.asarray(scrambling.scramble_llrs(llrs, cinits))
    np.testing.assert_allclose(descr, 1.0 - 2.0 * bits, atol=1e-6)
