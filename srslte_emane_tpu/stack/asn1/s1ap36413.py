"""S1AP (36.413) aligned-PER codec — reference-vector subset.

The reference's S1AP codec is `lib/src/asn1/liblte_s1ap.cc` (~50k LoC of
generated pack/unpack); its test (`lib/test/asn1/s1ap_test.cc`) pins a
captured S1SetupResponse carrying ServedGUMMEIs with six PLMNs.  This
module implements the ALIGNED PER rules that message exercises (X.691:
constrained whole numbers as bit-fields vs aligned octets by range,
octet-aligned open types with length determinants, size-constrained
SEQUENCE OF, enumerated criticality) plus the S1SetupRequest/Response
message schemas over them — decoding that capture byte-exact and
generating valid wire messages of its own.

The in-simulator S1AP transport stays `apps/rpc.py` typed messages; this
codec is the interop surface."""

from __future__ import annotations

import dataclasses


class AperError(ValueError):
    pass


class BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.bit = 0

    def read_bits(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte, off = divmod(self.bit, 8)
            if byte >= len(self.d):
                raise AperError("truncated")
            out = (out << 1) | ((self.d[byte] >> (7 - off)) & 1)
            self.bit += 1
        return out

    def align(self):
        self.bit = (self.bit + 7) & ~7

    def read_octets(self, n: int) -> bytes:
        self.align()
        byte = self.bit // 8
        if byte + n > len(self.d):
            raise AperError("truncated octets")
        self.bit += 8 * n
        return self.d[byte : byte + n]

    @property
    def exhausted(self):
        return self.bit >= 8 * len(self.d)


class BitWriter:
    def __init__(self):
        self.bits = []

    def write_bits(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def write_octets(self, b: bytes):
        self.align()
        for x in b:
            self.write_bits(x, 8)

    def to_bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for bit in self.bits[i : i + 8]:
                v = (v << 1) | bit
            out.append(v)
        return bytes(out)


# ---- X.691 aligned-PER primitives ----------------------------------------

def read_constrained(r: BitReader, lo: int, hi: int) -> int:
    """Constrained whole number (X.691 §10.5, ALIGNED): range <= 255 is an
    unaligned bit-field; range == 256 one aligned octet; <= 65536 two."""
    rng = hi - lo + 1
    if rng == 1:
        return lo
    if rng <= 255:
        return lo + r.read_bits((rng - 1).bit_length())
    if rng == 256:
        return lo + r.read_octets(1)[0]
    if rng <= 65536:
        return lo + int.from_bytes(r.read_octets(2), "big")
    raise AperError(f"range {rng} not supported")


def write_constrained(w: BitWriter, v: int, lo: int, hi: int):
    rng = hi - lo + 1
    if rng == 1:
        return
    if rng <= 255:
        w.write_bits(v - lo, (rng - 1).bit_length())
    elif rng == 256:
        w.write_octets(bytes([v - lo]))
    elif rng <= 65536:
        w.write_octets((v - lo).to_bytes(2, "big"))
    else:
        raise AperError(f"range {rng} not supported")


def read_length(r: BitReader) -> int:
    """Unconstrained length determinant (X.691 §10.9, aligned)."""
    r.align()
    b0 = r.read_octets(1)[0]
    if b0 < 0x80:
        return b0
    if b0 < 0xC0:
        return ((b0 & 0x3F) << 8) | r.read_octets(1)[0]
    raise AperError("fragmented lengths not supported")


def write_length(w: BitWriter, n: int):
    w.align()
    if n < 0x80:
        w.write_octets(bytes([n]))
    elif n < 0x4000:
        w.write_octets(bytes([0x80 | (n >> 8), n & 0xFF]))
    else:
        raise AperError("fragmented lengths not supported")


def read_open_type(r: BitReader) -> bytes:
    return r.read_octets(read_length(r))


def write_open_type(w: BitWriter, b: bytes):
    write_length(w, len(b))
    w.write_octets(b)


# ---- S1AP structures -------------------------------------------------------

CRITICALITY = ("reject", "ignore", "notify")

# procedure codes (36.413 §9.3.7)
PROC_S1SETUP = 17

# protocol IE ids
ID_GLOBAL_ENB_ID = 59
ID_ENB_NAME = 60
ID_MME_NAME = 61
ID_SERVED_GUMMEIS = 105
ID_RELATIVE_MME_CAPACITY = 87
ID_SUPPORTED_TAS = 64
ID_DEFAULT_PAGING_DRX = 137


@dataclasses.dataclass
class ProtocolIE:
    id: int
    criticality: str
    value: object  # decoded per-IE python value


@dataclasses.dataclass
class S1apPdu:
    pdu_type: str  # initiatingMessage | successfulOutcome | unsuccessfulOutcome
    procedure_code: int
    criticality: str
    ies: list


def _read_gummei_list(r: BitReader) -> list:
    """ServedGUMMEIs ::= SEQUENCE (SIZE(1..8)) OF ServedGUMMEIsItem."""
    n = read_constrained(r, 1, 8)
    out = []
    for _ in range(n):
        ext = r.read_bits(1)
        has_exts = r.read_bits(1)  # iE-Extensions OPTIONAL
        if ext or has_exts:
            raise AperError("ServedGUMMEIsItem extensions not supported")
        n_plmn = read_constrained(r, 1, 32)
        plmns = [r.read_octets(3) for _ in range(n_plmn)]
        n_grp = read_constrained(r, 1, 65535)
        groups = [r.read_octets(2) for _ in range(n_grp)]
        n_mmec = read_constrained(r, 1, 256)
        codes = [r.read_octets(1) for _ in range(n_mmec)]
        out.append(dict(plmns=plmns, group_ids=groups, mme_codes=codes))
    return out


def _write_gummei_list(w: BitWriter, items: list):
    write_constrained(w, len(items), 1, 8)
    for it in items:
        w.write_bits(0, 2)  # ext + no iE-Extensions
        write_constrained(w, len(it["plmns"]), 1, 32)
        for p in it["plmns"]:
            w.write_octets(bytes(p))
        write_constrained(w, len(it["group_ids"]), 1, 65535)
        for g in it["group_ids"]:
            w.write_octets(bytes(g))
        write_constrained(w, len(it["mme_codes"]), 1, 256)
        for c in it["mme_codes"]:
            w.write_octets(bytes(c))


def _read_mme_name(r: BitReader) -> str:
    # PrintableString SIZE(1..150, ...)
    n = read_constrained(r, 1, 150)
    return r.read_octets(n).decode()


_IE_DECODERS = {
    ID_SERVED_GUMMEIS: _read_gummei_list,
    ID_RELATIVE_MME_CAPACITY: lambda r: read_constrained(r, 0, 255),
    ID_MME_NAME: _read_mme_name,
}


def _encode_ie_value(ie: ProtocolIE) -> bytes:
    w = BitWriter()
    if ie.id == ID_SERVED_GUMMEIS:
        _write_gummei_list(w, ie.value)
    elif ie.id == ID_RELATIVE_MME_CAPACITY:
        write_constrained(w, ie.value, 0, 255)
    elif ie.id == ID_MME_NAME:
        write_constrained(w, len(ie.value), 1, 150)
        w.write_octets(ie.value.encode())
    elif isinstance(ie.value, (bytes, bytearray)):
        w.write_octets(bytes(ie.value))  # raw passthrough
    else:
        raise AperError(f"cannot encode IE {ie.id}")
    return w.to_bytes()


def _read_ie_container(r: BitReader) -> list:
    n = read_constrained(r, 0, 65535)
    ies = []
    for _ in range(n):
        ie_id = read_constrained(r, 0, 65535)
        crit = CRITICALITY[r.read_bits(2)]
        body = read_open_type(r)
        dec = _IE_DECODERS.get(ie_id)
        val = dec(BitReader(body)) if dec else body
        ies.append(ProtocolIE(ie_id, crit, val))
    return ies


def decode_pdu(data: bytes) -> S1apPdu:
    r = BitReader(bytes(data))
    if r.read_bits(1):
        raise AperError("extended PDU choice")
    idx = r.read_bits(2)
    pdu_type = ("initiatingMessage", "successfulOutcome",
                "unsuccessfulOutcome")[idx]
    proc = read_constrained(r, 0, 255)
    crit = CRITICALITY[r.read_bits(2)]
    body = read_open_type(r)
    br = BitReader(body)
    if br.read_bits(1):
        raise AperError("extended message sequence")
    ies = _read_ie_container(br)
    return S1apPdu(pdu_type, proc, crit, ies)


def encode_pdu(pdu: S1apPdu) -> bytes:
    w = BitWriter()
    idx = ("initiatingMessage", "successfulOutcome",
           "unsuccessfulOutcome").index(pdu.pdu_type)
    w.write_bits(0, 1)
    w.write_bits(idx, 2)
    write_constrained(w, pdu.procedure_code, 0, 255)
    w.write_bits(CRITICALITY.index(pdu.criticality), 2)
    # message body: sequence ext bit + IE container
    bw = BitWriter()
    bw.write_bits(0, 1)
    write_constrained(bw, len(pdu.ies), 0, 65535)
    for ie in pdu.ies:
        write_constrained(bw, ie.id, 0, 65535)
        bw.write_bits(CRITICALITY.index(ie.criticality), 2)
        write_open_type(bw, _encode_ie_value(ie))
    write_open_type(w, bw.to_bytes())
    return w.to_bytes()
