"""Full 24.301 NAS message-set wire-codec coverage.

The reference's `lib/src/asn1/liblte_mme.cc` packs/unpacks the complete
EMM/ESM message set; round 1 flagged our codec as a 3-message subset.
This test drives every message table in `stack/asn1/nas24301.py` through
construct -> encode -> decode -> re-encode, asserting field fidelity and
byte-exact re-encode (the same self-consistency contract liblte_mme's own
test applies), plus fixed wire vectors pinning the layouts that are easy
to get subtly wrong (security headers, half-octets, TV vs TLV).
"""

import pytest

from srslte_emane_tpu.stack.asn1 import nas24301 as nas


def _value_for(field, i):
    """Deterministic representative value for a field spec."""
    name, kind = field[0], field[1]
    if kind == "v":
        return bytes((7 + i + j) % 256 for j in range(field[2]))
    if kind == "half":
        return ((i + 1) % 16, (i + 5) % 16)
    if kind in ("lv", "lve", "tlv", "tlve"):
        return bytes((3 + i + j) % 256 for j in range(2 + (i % 3)))
    if kind == "tv":
        return bytes((9 + i + j) % 256 for j in range(field[3]))
    if kind == "thv":
        return (i + 3) % 16
    raise AssertionError(kind)


def _roundtrip_fields(head: dict, fields, optionals: bool):
    msg = dict(head)
    for i, f in enumerate(fields):
        mandatory = f[1] in ("v", "half", "lv", "lve")
        if mandatory or optionals:
            msg[f[0]] = _value_for(f, i)
    wire = nas.encode(msg)
    got = nas.decode(wire)
    for i, f in enumerate(fields):
        want = msg.get(f[0])
        assert got.get(f[0]) == want, (f[0], got.get(f[0]), want)
    assert nas.encode(got) == wire
    return got


@pytest.mark.parametrize("msg_type", sorted(nas._EMM_MSGS))
@pytest.mark.parametrize("optionals", [False, True])
def test_emm_roundtrip(msg_type, optionals):
    name, fields = nas._EMM_MSGS[msg_type]
    head = dict(protocol_discriminator=nas.PD_EMM, msg_type=msg_type)
    got = _roundtrip_fields(head, fields, optionals)
    assert got["msg_name"] == name


@pytest.mark.parametrize("msg_type", sorted(nas._ESM_MSGS))
@pytest.mark.parametrize("optionals", [False, True])
def test_esm_roundtrip(msg_type, optionals):
    name, fields = nas._ESM_MSGS[msg_type]
    head = dict(protocol_discriminator=nas.PD_ESM, eps_bearer_id=5, pti=3,
                msg_type=msg_type)
    got = _roundtrip_fields(head, fields, optionals)
    assert got["msg_name"] == name
    assert got["eps_bearer_id"] == 5 and got["pti"] == 3


def test_message_set_matches_reference_breadth():
    """liblte_mme.h enumerates the EMM+ESM message set; ours must cover the
    non-test-mode types (ACTIVATE_TEST_MODE etc. are TC protocol, not EMM)."""
    assert len(nas._EMM_MSGS) >= 28
    assert len(nas._ESM_MSGS) >= 23


def test_service_request_wire_format():
    # 24.301 §8.2.25: 0xC7 | KSI+seq | short MAC — no msg-type octet
    wire = bytes([0xC7, (0x5 << 5) | 0x11, 0xAB, 0xCD])
    got = nas.decode(wire)
    assert got["msg_name"] == "service_request"
    assert got["ksi"] == 5 and got["seq"] == 0x11
    assert got["short_mac"] == b"\xab\xcd"
    assert nas.encode(got) == wire


def test_authentication_request_wire_vector():
    # hand-assembled per 24.301 §8.2.7: pd 07, type 52, spare+KSI,
    # RAND(16), AUTN LV
    rand = bytes(range(16))
    autn = bytes(range(100, 116))
    wire = bytes([0x07, 0x52, 0x02]) + rand + bytes([16]) + autn
    got = nas.decode(wire)
    assert got["msg_name"] == "authentication_request"
    assert got["ksi"] == (0, 2)
    assert got["rand"] == rand and got["autn"] == autn
    assert nas.encode(got) == wire


def test_security_mode_command_wire_vector():
    # pd 07, type 5D, algs (EEA2/EIA2 = 0x22), spare+KSI=0, replayed caps,
    # IMEISV request thv 0xC1
    caps = b"\xf0\xf0\xc0"
    wire = bytes([0x07, 0x5D, 0x22, 0x00, len(caps)]) + caps + bytes([0xC1])
    got = nas.decode(wire)
    assert got["msg_name"] == "security_mode_command"
    assert got["selected_nas_algs"] == b"\x22"
    assert got["replayed_ue_capabilities"] == caps
    assert got["imeisv_request"] == 1
    assert nas.encode(got) == wire


def test_attach_reject_with_esm_container():
    # ESM container in ATTACH REJECT is TLV-E (2-byte length, IEI 0x78)
    inner = nas.encode(dict(
        protocol_discriminator=nas.PD_ESM, eps_bearer_id=0, pti=1,
        msg_type=nas.PDN_CONNECTIVITY_REJECT, esm_cause=b"\x1a"))
    msg = dict(protocol_discriminator=nas.PD_EMM,
               msg_type=nas.ATTACH_REJECT, emm_cause=b"\x0b",
               esm_container=inner)
    wire = nas.encode(msg)
    assert wire[:3] == bytes([0x07, 0x44, 0x0B])
    assert wire[3] == 0x78 and wire[4:6] == len(inner).to_bytes(2, "big")
    got = nas.decode(wire)
    assert got["esm_container"] == inner
    assert nas.decode(got["esm_container"])["esm_cause"] == b"\x1a"


def test_security_protected_wrapping():
    inner = dict(protocol_discriminator=nas.PD_EMM,
                 msg_type=nas.IDENTITY_REQUEST, identity_type=(0, 1))
    plain = nas.encode(inner)
    wire = bytes([0x27]) + b"\x35\x11\xfd\xf6" + bytes([7]) + plain
    got = nas.decode(wire)
    assert got["security_header"] == 2 and got["seq"] == 7
    assert got["inner"]["msg_name"] == "identity_request"
    assert nas.encode(got) == wire


# ---- golden vectors packed by the REFERENCE's liblte_mme codec ------------
# Produced by scripts/s1ap_interop/pack_nas.cpp (compiles liblte_mme.cc and
# packs each message with fixed field values).  Our decoder must read every
# byte-exact and re-encode identically — cross-codec interop in both
# directions, like the S1AP harness.

LIBLTE_VECTORS = {
    "authentication_request":
        "075202000102030405060708090a0b0c0d0e0f"
        "106465666768696a6b6c6d6e6f70717273",
    "authentication_reject": "0754",
    "identity_request": "075501",
    "security_mode_command": "075d220002e060c1",
    "detach_request": "0745110bf600f11012341adeadbeef",
    "service_reject": "074e275b25",
    "guti_reallocation_command": "07500bf600f11000020301020304",
    "emm_information": "076143078673f99c492d0245048373f91c",
    "pdn_connectivity_request": "0201d011d1",
    "esm_information_response": "0201da280908696e7465726e6574",
}


@pytest.mark.parametrize("name", sorted(LIBLTE_VECTORS))
def test_liblte_packed_vector(name):
    wire = bytes.fromhex(LIBLTE_VECTORS[name])
    got = nas.decode(wire)
    assert got["msg_name"] == name
    assert nas.encode(got) == wire


def test_liblte_vector_fields():
    got = nas.decode(bytes.fromhex(LIBLTE_VECTORS["authentication_request"]))
    assert got["ksi"] == (0, 2)
    assert got["rand"] == bytes(range(16))
    assert got["autn"] == bytes(range(100, 116))
    got = nas.decode(bytes.fromhex(LIBLTE_VECTORS["security_mode_command"]))
    assert got["selected_nas_algs"] == b"\x22"
    assert got["replayed_ue_capabilities"] == b"\xe0\x60"
    assert got["imeisv_request"] == 1
    got = nas.decode(bytes.fromhex(LIBLTE_VECTORS["service_reject"]))
    assert got["emm_cause"] == b"\x27" and got["t3442"] == b"\x25"
    got = nas.decode(bytes.fromhex(LIBLTE_VECTORS["detach_request"]))
    assert got["ksi_detach_type"] == (1, 1)
    from srslte_emane_tpu.stack.asn1.nas24301 import parse_guti
    g = parse_guti(got["eps_mobile_identity"])
    assert g["mme_code"] == 0x1A and g["m_tmsi"] == 0xDEADBEEF
    got = nas.decode(bytes.fromhex(LIBLTE_VECTORS["esm_information_response"]))
    from srslte_emane_tpu.stack.asn1.nas24301 import parse_apn
    assert parse_apn(got["apn"]) == "internet"
    got = nas.decode(bytes.fromhex(
        LIBLTE_VECTORS["pdn_connectivity_request"]))
    assert got["pdn_request_type"] == (1, 1)
    assert got["esm_info_transfer_flag"] == 1
