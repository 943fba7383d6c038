"""UCI coding: Reed-Muller block codes for CQI/ACK/RI + CQI report packing.

Reference behavior: `lib/src/phy/phch/uci.c` — (32, O) RM code (M_basis_seq,
uci.c:43, encode at :206), PUCCH (20, A) code (uci.c:79, :137-152); and
`lib/src/phy/phch/cqi.c` report pack/unpack.

TPU design: encode is a GF(2) matmul with the basis matrix; decode is soft ML
correlation against all 2^O codewords (O <= 13 on PUCCH, O <= 11 per RM32
block) — one (B, N) x (N, 2^O) matmul, exactly the kind of brute force the
MXU makes free.
"""

from __future__ import annotations

import functools
import pathlib

import jax.numpy as jnp
import numpy as np

_DATA = np.load(pathlib.Path(__file__).parent / "uci_tables.npz")
RM32 = _DATA["rm32"].astype(np.int64)  # (32, 11)
RM20 = _DATA["rm20"].astype(np.int64)  # (20, 13)


def encode_rm(bits, n_out: int, basis: np.ndarray = RM32):
    """(B, O) info bits -> (B, n_out) coded bits; circular repetition beyond
    the mother code length (uci.c:617)."""
    bits = jnp.asarray(bits, jnp.int32)
    n, k = basis.shape
    b = bits.shape[-1]
    cw = (bits @ jnp.asarray(basis[:, :b].T, dtype=jnp.int32)) & 1  # (B, n)
    idx = np.arange(n_out) % n
    return jnp.take(cw, jnp.asarray(idx), axis=-1).astype(jnp.int8)


def encode_rm20(bits, basis: np.ndarray = RM20):
    return encode_rm(bits, 20, basis)


@functools.lru_cache(maxsize=None)
def _codebook(n_bits: int, n_out: int, which: str):
    basis = RM32 if which == "rm32" else RM20
    n = basis.shape[0]
    msgs = np.array([[(v >> i) & 1 for i in range(n_bits)]
                     for v in range(1 << n_bits)], dtype=np.int64)
    cw = (msgs @ basis[:, :n_bits].T) % 2
    cw = cw[:, np.arange(n_out) % n]
    return msgs.astype(np.int8), (1.0 - 2.0 * cw).astype(np.float32)


def decode_rm(llrs, n_bits: int, which: str = "rm32"):
    """Soft ML decode: (B, E) LLRs (positive = bit 0) -> ((B, n_bits) bits,
    (B,) correlation metric)."""
    msgs, book = _codebook(n_bits, llrs.shape[-1], which)
    corr = llrs @ jnp.asarray(book.T)  # (B, 2^O)
    best = jnp.argmax(corr, axis=-1)
    bits = jnp.take(jnp.asarray(msgs), best, axis=0)
    return bits, jnp.max(corr, axis=-1)


# ---- CQI report packing (cqi.c subset: wideband report) ----

def pack_cqi_wideband(cqi: int, pmi: int = None, ri_bits: int = 0) -> np.ndarray:
    bits = [(cqi >> (3 - i)) & 1 for i in range(4)]
    if pmi is not None:
        bits += [(pmi >> 1) & 1, pmi & 1]
    return np.array(bits, dtype=np.int8)


def unpack_cqi_wideband(bits, has_pmi: bool = False) -> dict:
    bits = np.asarray(bits)
    cqi = int("".join(map(str, bits[:4])), 2)
    out = dict(cqi=cqi)
    if has_pmi:
        out["pmi"] = int("".join(map(str, bits[4:6])), 2)
    return out


def cqi_hl_subband_size(n_prb: int) -> int:
    """Number of higher-layer-configured subbands (36.213 Table 7.2.1-3:
    subband size k by bandwidth)."""
    if n_prb <= 7:
        return 0
    k = 4 if n_prb <= 26 else 6 if n_prb <= 63 else 8
    return -(-n_prb // k)


def pack_cqi_hl_subband(wb_cqi: int, sb_diffs, n_prb: int) -> np.ndarray:
    """Aperiodic higher-layer-configured subband report (cqi.c HL format):
    4-bit wideband CQI + 2-bit differential CQI per subband."""
    n_sb = cqi_hl_subband_size(n_prb)
    assert len(sb_diffs) == n_sb, (len(sb_diffs), n_sb)
    bits = [(wb_cqi >> (3 - i)) & 1 for i in range(4)]
    for d in sb_diffs:
        assert 0 <= d <= 3
        bits += [(d >> 1) & 1, d & 1]
    return np.array(bits, dtype=np.int8)


def unpack_cqi_hl_subband(bits, n_prb: int) -> dict:
    bits = np.asarray(bits).astype(int)
    n_sb = cqi_hl_subband_size(n_prb)
    wb = int("".join(map(str, bits[:4])), 2)
    diffs = [int("".join(map(str, bits[4 + 2 * i : 6 + 2 * i])), 2)
             for i in range(n_sb)]
    return dict(wideband_cqi=wb, subband_diff_cqi=diffs)


# offset applied to the wideband CQI per differential value (36.213 7.2.1-2)
SUBBAND_DIFF_OFFSET = {0: 0, 1: 1, 2: 2, 3: -1}
