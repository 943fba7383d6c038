"""24.301/24.008 NAS wire codec (byte-level TLV).

The reference carries NAS EMM/ESM as hand-packed TLV octets
(`lib/src/asn1/liblte_mme.cc`, ~13k LoC of pack/unpack pairs); its test
suite pins real captured messages (`lib/test/asn1/srslte_asn1_nas_test.cc`,
`srsue/test/upper/rrc_reconfig_test.cc`).  This module is a declarative
Python codec for the same wire format: each message is a field list over a
small set of IE primitives (V / half-octet V / LV / LV-E / TV / TLV /
half-octet TV), decoded to dicts and re-encoded byte-exact.

The message-level simulator keeps using `stack/nas_msgs.py` internally;
this codec exists for interop — decoding and generating the REAL wire
bytes (tests/test_nas_reference_vectors.py round-trips the reference's
captured vectors)."""

from __future__ import annotations

# protocol discriminators
PD_EMM = 7
PD_ESM = 2

# EMM message types (24.301 Table 9.8.1)
ATTACH_ACCEPT = 0x42
# ESM message types (24.301 Table 9.8.2)
ACT_DEFAULT_BEARER_REQ = 0xC1
ACT_DEDICATED_BEARER_REQ = 0xC5

SEC_PLAIN = 0


class NasDecodeError(ValueError):
    pass


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def take(self, n: int) -> bytes:
        if self.p + n > len(self.d):
            raise NasDecodeError(f"truncated at {self.p}+{n}/{len(self.d)}")
        out = self.d[self.p : self.p + n]
        self.p += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def peek(self):
        return self.d[self.p] if self.p < len(self.d) else None

    @property
    def exhausted(self):
        return self.p >= len(self.d)


# ---- field kinds ----------------------------------------------------------
# ("name", kind, *args); optional IEs carry their IEI.
#   v(n)     mandatory fixed n-byte value
#   half     mandatory half-octet value pair packed in one byte (hi, lo)
#   lv       mandatory 1-byte-length + value
#   lve      mandatory 2-byte-length + value (ESM container)
#   tlv(iei) optional IEI + 1-byte-length + value
#   tv(iei)  optional IEI + fixed n-byte value
#   thv(iei) optional half-octet: IEI in the high nibble, value in the low


def _dec_fields(r: _Reader, fields) -> dict:
    out = {}
    for f in fields:
        name, kind = f[0], f[1]
        if kind == "v":
            out[name] = r.take(f[2])
        elif kind == "half":
            b = r.u8()
            out[name] = (b >> 4, b & 0x0F)
        elif kind == "lv":
            out[name] = r.take(r.u8())
        elif kind == "lve":
            n = int.from_bytes(r.take(2), "big")
            out[name] = r.take(n)
        elif kind == "tlv":
            if r.peek() == f[2]:
                r.u8()
                out[name] = r.take(r.u8())
        elif kind == "tv":
            if r.peek() == f[2]:
                r.u8()
                out[name] = r.take(f[3])
        elif kind == "thv":
            b = r.peek()
            if b is not None and (b >> 4) == f[2]:
                out[name] = r.u8() & 0x0F
        else:
            raise AssertionError(kind)
    return out


def _enc_fields(msg: dict, fields) -> bytes:
    out = bytearray()
    for f in fields:
        name, kind = f[0], f[1]
        v = msg.get(name)
        if kind == "v":
            assert len(v) == f[2], (name, v)
            out += v
        elif kind == "half":
            out.append((v[0] << 4) | v[1])
        elif kind == "lv":
            out.append(len(v))
            out += v
        elif kind == "lve":
            out += len(v).to_bytes(2, "big")
            out += v
        elif kind == "tlv":
            if v is not None:
                out.append(f[2])
                out.append(len(v))
                out += v
        elif kind == "tv":
            if v is not None:
                out.append(f[2])
                out += v
        elif kind == "thv":
            if v is not None:
                out.append((f[2] << 4) | (v & 0x0F))
        else:
            raise AssertionError(kind)
    return bytes(out)


# ---- message field tables (24.301 §8; IEI values per liblte_mme.h) -------

ATTACH_ACCEPT_FIELDS = (
    ("attach_result", "half"),       # result + spare half octet
    ("t3412", "v", 1),               # GPRS timer
    ("tai_list", "lv"),
    ("esm_container", "lve"),
    ("guti", "tlv", 0x50),           # EPS mobile identity
    ("lai", "tv", 0x13, 5),
    ("ms_identity", "tlv", 0x23),
    ("emm_cause", "tv", 0x53, 1),
    ("t3402", "tv", 0x17, 1),
    ("t3423", "tv", 0x59, 1),
    ("equivalent_plmns", "tlv", 0x4A),
    ("emergency_numbers", "tlv", 0x34),
    ("eps_network_feature_support", "tlv", 0x64),
    ("additional_update_result", "thv", 0xF),
)

ACT_DEFAULT_BEARER_REQ_FIELDS = (
    ("eps_qos", "lv"),
    ("apn", "lv"),
    ("pdn_address", "lv"),
    ("transaction_id", "tlv", 0x5D),
    ("negotiated_qos", "tlv", 0x30),
    ("llc_sapi", "tv", 0x32, 1),
    ("radio_priority", "thv", 0x8),
    ("packet_flow_id", "tlv", 0x34),
    ("apn_ambr", "tlv", 0x5E),
    ("esm_cause", "tv", 0x58, 1),
    ("protocol_config_options", "tlv", 0x27),
)

ACT_DEDICATED_BEARER_REQ_FIELDS = (
    ("linked_ebi", "half"),          # linked EPS bearer id + spare
    ("eps_qos", "lv"),
    ("tft", "lv"),
    ("transaction_id", "tlv", 0x5D),
    ("negotiated_qos", "tlv", 0x30),
    ("llc_sapi", "tv", 0x32, 1),
    ("radio_priority", "thv", 0x8),
    ("packet_flow_id", "tlv", 0x34),
    ("protocol_config_options", "tlv", 0x27),
)

_EMM_MSGS = {ATTACH_ACCEPT: ("attach_accept", ATTACH_ACCEPT_FIELDS)}
_ESM_MSGS = {
    ACT_DEFAULT_BEARER_REQ: ("activate_default_eps_bearer_context_request",
                             ACT_DEFAULT_BEARER_REQ_FIELDS),
    ACT_DEDICATED_BEARER_REQ: ("activate_dedicated_eps_bearer_context_request",
                               ACT_DEDICATED_BEARER_REQ_FIELDS),
}


# ---- top level ------------------------------------------------------------

def decode(data: bytes) -> dict:
    """Decode one NAS message (plain or security-protected) to a dict.

    Security-protected messages keep mac/seq verbatim and decode the inner
    plain message recursively (the simulator's ciphering is EEA0-style for
    these vectors, matching how the reference test decodes them)."""
    r = _Reader(bytes(data))
    first = r.u8()
    sec_hdr, pd = first >> 4, first & 0x0F
    # the high nibble is a security-header type ONLY for EMM; for ESM it
    # is the EPS bearer identity (24.301 §9.2)
    if pd == PD_EMM and sec_hdr != SEC_PLAIN:
        mac = r.take(4)
        seq = r.u8()
        inner = decode(r.d[r.p :])
        return dict(security_header=sec_hdr, protocol_discriminator=pd,
                    mac=mac, seq=seq, inner=inner)
    if pd == PD_EMM:
        msg_type = r.u8()
        if msg_type not in _EMM_MSGS:
            raise NasDecodeError(f"EMM message 0x{msg_type:02x} not supported")
        name, fields = _EMM_MSGS[msg_type]
        out = dict(protocol_discriminator=pd, msg_type=msg_type,
                   msg_name=name)
        out.update(_dec_fields(r, fields))
        if "esm_container" in out:
            out["esm"] = decode(out["esm_container"])
        return out
    if pd == PD_ESM:
        # first octet: EPS bearer id (hi) + pd (lo); then PTI, msg type
        ebi = sec_hdr
        pti = r.u8()
        msg_type = r.u8()
        if msg_type not in _ESM_MSGS:
            raise NasDecodeError(f"ESM message 0x{msg_type:02x} not supported")
        name, fields = _ESM_MSGS[msg_type]
        out = dict(protocol_discriminator=pd, eps_bearer_id=ebi, pti=pti,
                   msg_type=msg_type, msg_name=name)
        out.update(_dec_fields(r, fields))
        return out
    raise NasDecodeError(f"protocol discriminator {pd} not supported")


def encode(msg: dict) -> bytes:
    """Inverse of decode: byte-exact re-encode."""
    if "mac" in msg:
        first = (msg["security_header"] << 4) | msg["protocol_discriminator"]
        return (bytes([first]) + msg["mac"] + bytes([msg["seq"]])
                + encode(msg["inner"]))
    pd = msg["protocol_discriminator"]
    if pd == PD_EMM:
        name, fields = _EMM_MSGS[msg["msg_type"]]
        return (bytes([pd, msg["msg_type"]]) + _enc_fields(msg, fields))
    if pd == PD_ESM:
        name, fields = _ESM_MSGS[msg["msg_type"]]
        head = bytes([(msg["eps_bearer_id"] << 4) | pd, msg["pti"],
                      msg["msg_type"]])
        return head + _enc_fields(msg, fields)
    raise NasDecodeError(f"cannot encode pd {pd}")


# ---- semantic helpers for the tested substructures -----------------------

def parse_guti(b: bytes) -> dict:
    """EPS mobile identity, GUTI flavor (24.301 §9.9.3.12)."""
    assert b[0] & 0x0F == 0x06, "not a GUTI mobile identity"
    return dict(
        plmn=b[1:4].hex(),
        mme_group_id=int.from_bytes(b[4:6], "big"),
        mme_code=b[6],
        m_tmsi=int.from_bytes(b[7:11], "big"),
    )


def parse_apn(b: bytes) -> str:
    """APN label encoding (24.008 §10.5.6.1)."""
    out, p = [], 0
    while p < len(b):
        n = b[p]
        out.append(b[p + 1 : p + 1 + n].decode())
        p += 1 + n
    return ".".join(out)


def parse_pdn_address(b: bytes) -> dict:
    typ = b[0] & 0x07
    names = {1: "ipv4", 2: "ipv6", 3: "ipv4v6"}
    out = dict(type=names.get(typ, typ))
    if typ == 1:
        out["ipv4"] = ".".join(str(x) for x in b[1:5])
    return out


def parse_tft(b: bytes) -> dict:
    """Traffic flow template (24.008 §10.5.6.12), filters as raw contents."""
    op = b[0] >> 5
    n_filters = b[0] & 0x0F
    filters, p = [], 1
    for _ in range(n_filters):
        ident = b[p] & 0x0F
        direction = (b[p] >> 4) & 0x3
        precedence = b[p + 1]
        n = b[p + 2]
        filters.append(dict(id=ident, direction=direction,
                            precedence=precedence,
                            components=b[p + 3 : p + 3 + n]))
        p += 3 + n
    return dict(op_code=op, filters=filters)
