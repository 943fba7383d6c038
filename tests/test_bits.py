"""Device bit pack/unpack (bit.c parity)."""

import numpy as np

from srslte_emane_tpu.ops import bits


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(3, 17), dtype=np.uint8)
    b = np.asarray(bits.unpack_bits(data))
    assert b.shape == (3, 136)
    back = np.asarray(bits.pack_bits(b))
    np.testing.assert_array_equal(back, data)
    # MSB-first convention matches numpy packbits
    np.testing.assert_array_equal(b[0], np.unpackbits(data[0]))


def test_host_helpers():
    data = b"\x80\x01\xff"
    b = bits.bytes_to_bits(data)
    assert b[0] == 1 and b[7] == 0 and b[15] == 1
    assert bits.bits_to_bytes(b) == data
