"""Bit pack/unpack ops (the `lib/src/phy/utils/bit.c` role).

Device-side conversions between byte payloads and 0/1 bit tensors
(MSB-first, matching srslte_bit_unpack_vector), plus host helpers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def unpack_bits(bytes_arr: jnp.ndarray) -> jnp.ndarray:
    """(..., N) uint8 -> (..., N*8) int8 bits, MSB first."""
    b = jnp.asarray(bytes_arr, jnp.uint8)
    shifts = np.arange(7, -1, -1, dtype=np.uint8)
    bits = (b[..., None] >> shifts) & 1
    return bits.reshape(b.shape[:-1] + (-1,)).astype(jnp.int8)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., N*8) bits -> (..., N) uint8, MSB first."""
    x = jnp.asarray(bits, jnp.int32)
    x = x.reshape(x.shape[:-1] + (-1, 8))
    weights = (2 ** np.arange(7, -1, -1)).astype(np.int32)
    return jnp.sum(x * weights, axis=-1).astype(jnp.uint8)


def bytes_to_bits(data: bytes) -> np.ndarray:
    return np.unpackbits(np.frombuffer(data, dtype=np.uint8)).astype(np.int8)


def bits_to_bytes(bits) -> bytes:
    return np.packbits(np.asarray(bits, dtype=np.uint8)).tobytes()
