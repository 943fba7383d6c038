"""36.211 scrambling (bits and LLRs) on top of the gold-sequence op.

Reference behavior: `lib/src/phy/scrambling/scrambling.c` — XOR for bits,
sign-flip for float/short/char LLR variants.

c_init values (36.211):
  PDSCH/PUSCH codeword q: rnti*2^14 + q*2^13 + floor(ns/2)*2^9 + cell_id
  PBCH: cell_id;  PCFICH: (floor(ns/2)+1)*(2*cell_id+1)*2^9 + cell_id
  PDCCH: floor(ns/2)*2^9 + cell_id
  PUCCH: (floor(ns/2)+1)*(2*cell_id+1)*2^16 + rnti
"""

from __future__ import annotations

import jax.numpy as jnp

from . import sequence


def pdsch_cinit(rnti, q, sf_idx, cell_id):
    return (rnti << 14) + (q << 13) + (sf_idx << 9) + cell_id


def pusch_cinit(rnti, sf_idx, cell_id):
    return (rnti << 14) + (sf_idx << 9) + cell_id


def pbch_cinit(cell_id):
    return cell_id


def pcfich_cinit(sf_idx, cell_id):
    return ((sf_idx + 1) * (2 * cell_id + 1) << 9) + cell_id


def pdcch_cinit(sf_idx, cell_id):
    return (sf_idx << 9) + cell_id


def scramble_bits(bits: jnp.ndarray, c_init, n: int = None) -> jnp.ndarray:
    """bits (..., E) ^ c(n).  c_init may be batched (leading dims must agree)."""
    n = bits.shape[-1] if n is None else n
    c = sequence.gold_sequence(c_init, n)
    return (bits ^ c).astype(bits.dtype)


def scramble_llrs(llrs: jnp.ndarray, c_init, n: int = None) -> jnp.ndarray:
    """Descramble soft values: flip sign where c(n)==1 (scrambling.c float path)."""
    n = llrs.shape[-1] if n is None else n
    c = sequence.gold_sequence(c_init, n)
    return llrs * (1.0 - 2.0 * c.astype(llrs.dtype))
