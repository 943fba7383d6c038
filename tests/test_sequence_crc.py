"""Gold sequence + CRC: device matmul path vs bit-serial NumPy oracles."""

import numpy as np
import pytest

from srslte_emane_tpu.ops import sequence
from srslte_emane_tpu.ops.fec import crc


@pytest.mark.parametrize("c_init", [0x1, 0x12345, 0x7FFFFFFF, 301, 12345678])
@pytest.mark.parametrize("n", [31, 100, 1600])
def test_gold_sequence_matches_lfsr(c_init, n):
    dev = np.asarray(sequence.gold_sequence(c_init, n))
    ref = sequence.gold_sequence_host(c_init, n)
    np.testing.assert_array_equal(dev, ref)


def test_gold_sequence_batched():
    cinits = np.array([1, 2, 3, 0x5EED], dtype=np.uint32)
    dev = np.asarray(sequence.gold_sequence(cinits, 200))
    for i, ci in enumerate(cinits):
        np.testing.assert_array_equal(dev[i], sequence.gold_sequence_host(int(ci), 200))


@pytest.mark.parametrize(
    "poly", [crc.LTE_CRC24A, crc.LTE_CRC24B, crc.LTE_CRC16, crc.LTE_CRC8]
)
@pytest.mark.parametrize("length", [40, 131, 6144])
def test_crc_matches_serial(poly, length):
    rng = np.random.default_rng(length + poly[0])
    bits = rng.integers(0, 2, size=(3, length), dtype=np.int8)
    dev = np.asarray(crc.crc_bits(bits, poly))
    for b in range(bits.shape[0]):
        np.testing.assert_array_equal(dev[b], crc.crc_host(bits[b], poly))


def test_crc_attach_check_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(4, 100), dtype=np.int8)
    coded = crc.crc_attach(bits, crc.LTE_CRC24A)
    assert bool(np.all(np.asarray(crc.crc_ok(coded, crc.LTE_CRC24A))))
    corrupted = np.asarray(coded).copy()
    corrupted[:, 17] ^= 1
    assert not bool(np.any(np.asarray(crc.crc_ok(corrupted, crc.LTE_CRC24A))))


def test_crc_known_vector():
    # "123456789" ASCII, CRC-16/CCITT (XModem, init 0) = 0x31C3 — pins the
    # polynomial/bit-order convention used for LTE CRC16 (poly 0x1021).
    data = b"123456789"
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8)).astype(np.int8)
    out = np.asarray(crc.crc_bits(bits, crc.LTE_CRC16))
    val = int("".join(map(str, out)), 2)
    assert val == 0x31C3
