"""DCI pack/unpack (formats 0, 1, 1A) — host-side control plane.

Reference behavior: `lib/src/phy/phch/dci.c` (all formats, 1,586 LoC).  Round
1 covers the formats the eNB scheduler and UE blind search actually exercise
end-to-end: 1A (compact DL, type-2 RA), 1 (DL, type-0 RA), 0 (UL grant).
Bit packing is MSB-first, matching srsLTE/36.212 §5.3.3.1.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


def _ceil_log2(x: int) -> int:
    return max(1, math.ceil(math.log2(x)))


def riv_len(n_prb: int) -> int:
    return _ceil_log2(n_prb * (n_prb + 1) // 2)


def _put(bits, off, val, n):
    for i in range(n):
        bits[off + i] = (val >> (n - 1 - i)) & 1
    return off + n


def _get(bits, off, n):
    v = 0
    for i in range(n):
        v = (v << 1) | int(bits[off + i])
    return v, off + n


@dataclasses.dataclass
class DciDl:
    """DL grant content (formats 1/1A)."""
    format: str  # "1" or "1A"
    mcs: int = 0
    harq_pid: int = 0
    ndi: int = 0
    rv: int = 0
    tpc: int = 0
    # format 1A (type-2 RA)
    rb_start: int = 0
    l_crbs: int = 1
    # format 1 (type-0 RA)
    rbg_bitmap: int = 0


@dataclasses.dataclass
class DciUl:
    """UL grant content (format 0)."""
    mcs: int = 0
    ndi: int = 0
    tpc: int = 0
    rb_start: int = 0
    l_crbs: int = 1
    dmrs_cs: int = 0
    cqi_req: int = 0
    hopping: int = 0


def format0_1a_len(n_prb: int) -> int:
    """Formats 0 and 1A are padded to equal length (36.212 §5.3.3.1.3)."""
    # format 0: flag(1)+hop(1)+riv+mcs(5)+ndi(1)+tpc(2)+dmrs(3)+cqi(1)
    f0 = 1 + 1 + riv_len(n_prb) + 5 + 1 + 2 + 3 + 1
    # format 1A: flag(1)+la/dist(1)+riv+mcs(5)+harq(3)+ndi(1)+rv(2)+tpc(2)
    f1a = 1 + 1 + riv_len(n_prb) + 5 + 3 + 1 + 2 + 2
    n = max(f0, f1a)
    # avoid ambiguous sizes (36.212 Table 5.3.3.1.2-1 forbidden lengths)
    while n in (12, 14, 16, 20, 24, 26, 32, 40, 44, 56):
        n += 1
    return n


def format1_len(n_prb: int) -> int:
    from . import ra

    n_rbg = -(-n_prb // ra.rbg_size(n_prb))
    n = 1 + n_rbg + 5 + 3 + 1 + 2 + 2  # ra_type flag only for >10 PRB in spec;
    # srsLTE format1: resource allocation header (1, absent for <=10 PRB)
    if n_prb <= 10:
        n -= 1
    while n == format0_1a_len(n_prb) or n in (12, 14, 16, 20, 24, 26, 32, 40, 44, 56):
        n += 1
    return n


def pack_dl(d: DciDl, n_prb: int) -> np.ndarray:
    from . import ra

    if d.format == "1A":
        n = format0_1a_len(n_prb)
        bits = np.zeros(n, dtype=np.int8)
        off = 0
        off = _put(bits, off, 1, 1)  # flag: 1 = format 1A
        off = _put(bits, off, 0, 1)  # localized
        riv = ra.riv_encode(d.rb_start, d.l_crbs, n_prb)
        off = _put(bits, off, riv, riv_len(n_prb))
        off = _put(bits, off, d.mcs, 5)
        off = _put(bits, off, d.harq_pid, 3)
        off = _put(bits, off, d.ndi, 1)
        off = _put(bits, off, d.rv, 2)
        off = _put(bits, off, d.tpc, 2)
        return bits
    if d.format == "1":
        n = format1_len(n_prb)
        n_rbg = -(-n_prb // ra.rbg_size(n_prb))
        bits = np.zeros(n, dtype=np.int8)
        off = 0
        if n_prb > 10:
            off = _put(bits, off, 0, 1)  # RA type 0
        off = _put(bits, off, d.rbg_bitmap, n_rbg)
        off = _put(bits, off, d.mcs, 5)
        off = _put(bits, off, d.harq_pid, 3)
        off = _put(bits, off, d.ndi, 1)
        off = _put(bits, off, d.rv, 2)
        off = _put(bits, off, d.tpc, 2)
        return bits
    raise ValueError(d.format)


def unpack_dl(bits: np.ndarray, n_prb: int, fmt: str) -> DciDl:
    from . import ra

    off = 0
    if fmt == "1A":
        flag, off = _get(bits, off, 1)
        _, off = _get(bits, off, 1)
        riv, off = _get(bits, off, riv_len(n_prb))
        mcs, off = _get(bits, off, 5)
        harq, off = _get(bits, off, 3)
        ndi, off = _get(bits, off, 1)
        rv, off = _get(bits, off, 2)
        tpc, off = _get(bits, off, 2)
        s, l = ra.riv_decode(riv, n_prb)
        return DciDl("1A", mcs, harq, ndi, rv, tpc, rb_start=s, l_crbs=l)
    if fmt == "1":
        n_rbg = -(-n_prb // ra.rbg_size(n_prb))
        if n_prb > 10:
            _, off = _get(bits, off, 1)
        bitmap, off = _get(bits, off, n_rbg)
        mcs, off = _get(bits, off, 5)
        harq, off = _get(bits, off, 3)
        ndi, off = _get(bits, off, 1)
        rv, off = _get(bits, off, 2)
        tpc, off = _get(bits, off, 2)
        return DciDl("1", mcs, harq, ndi, rv, tpc, rbg_bitmap=bitmap)
    raise ValueError(fmt)


def pack_ul(d: DciUl, n_prb: int) -> np.ndarray:
    from . import ra

    n = format0_1a_len(n_prb)
    bits = np.zeros(n, dtype=np.int8)
    off = 0
    off = _put(bits, off, 0, 1)  # flag: 0 = format 0
    off = _put(bits, off, d.hopping, 1)
    off = _put(bits, off, ra.riv_encode(d.rb_start, d.l_crbs, n_prb), riv_len(n_prb))
    off = _put(bits, off, d.mcs, 5)
    off = _put(bits, off, d.ndi, 1)
    off = _put(bits, off, d.tpc, 2)
    off = _put(bits, off, d.dmrs_cs, 3)
    off = _put(bits, off, d.cqi_req, 1)
    return bits


def unpack_ul(bits: np.ndarray, n_prb: int) -> DciUl:
    from . import ra

    off = 0
    _, off = _get(bits, off, 1)
    hop, off = _get(bits, off, 1)
    riv, off = _get(bits, off, riv_len(n_prb))
    mcs, off = _get(bits, off, 5)
    ndi, off = _get(bits, off, 1)
    tpc, off = _get(bits, off, 2)
    dmrs, off = _get(bits, off, 3)
    cqi, off = _get(bits, off, 1)
    s, l = ra.riv_decode(riv, n_prb)
    return DciUl(mcs, ndi, tpc, rb_start=s, l_crbs=l, dmrs_cs=dmrs, cqi_req=cqi, hopping=hop)


def is_format0(bits: np.ndarray) -> bool:
    return int(bits[0]) == 0
