"""S1AP (36.413) aligned-PER codec — reference-vector subset.

The reference's S1AP codec is `lib/src/asn1/liblte_s1ap.cc` (~50k LoC of
generated pack/unpack); its test (`lib/test/asn1/s1ap_test.cc`) pins a
captured S1SetupResponse carrying ServedGUMMEIs with six PLMNs.  The
ALIGNED-PER rules live in `aper.py`; this module adds the
S1SetupRequest/Response message schemas over them — decoding that capture
byte-exact and generating valid wire messages of its own.

The in-simulator S1AP transport stays `apps/rpc.py` typed messages; this
codec is the interop surface."""

from __future__ import annotations

import dataclasses

from .aper import (AperError, BitReader, BitWriter, read_constrained,
                   write_constrained, read_length, write_length,
                   read_open_type, write_open_type)

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
