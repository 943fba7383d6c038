"""UPER bit-level codec: X.691 primitive rules + RRC message round trips."""

import dataclasses

from srslte_emane_tpu.stack import codec, per, rrc_msgs


def test_bit_primitives():
    w = per.BitWriter()
    per.put_cint(w, 5, 0, 7)        # 3 bits: 101
    w.put_bits(1, 1)                # 1
    per.put_cint(w, 2, 0, 2)        # 2 bits: 10
    data = w.getvalue()
    assert data == bytes([0b10111000])  # packed with no inter-field padding
    r = per.BitReader(data)
    assert per.get_cint(r, 0, 7) == 5
    assert r.get_bits(1) == 1
    assert per.get_cint(r, 0, 2) == 2


def test_length_determinant():
    for n in (0, 1, 127, 128, 500, 16383):
        w = per.BitWriter()
        per.put_len(w, n)
        assert per.get_len(per.BitReader(w.getvalue())) == n
    # short form is exactly one byte
    w = per.BitWriter()
    per.put_len(w, 10)
    assert len(w.getvalue()) == 1


def test_unconstrained_int_signed():
    for v in (0, 1, -1, 255, -128, 123456, -99999, 2**40):
        w = per.BitWriter()
        per.put_uint(w, v)
        assert per.get_uint(per.BitReader(w.getvalue())) == v


def test_all_rrc_messages_roundtrip():
    msgs = [
        rrc_msgs.RrcConnectionRequest(ue_identity=0xABCDE, cause="mt-Access"),
        rrc_msgs.RrcConnectionSetup(),
        rrc_msgs.RrcConnectionSetupComplete(selected_plmn=2, nas_pdu=b"\x01\x02"),
        rrc_msgs.DlInformationTransfer(nas_pdu=b"nas"),
        rrc_msgs.UlInformationTransfer(nas_pdu=b"x" * 300),
        rrc_msgs.SecurityModeCommand(ciph_algo=3, int_algo=2),
        rrc_msgs.SecurityModeComplete(),
        rrc_msgs.UECapabilityEnquiry(),
        rrc_msgs.UECapabilityInformation(category=5, supports_64qam_ul=True),
        rrc_msgs.RrcConnectionReconfiguration(
            drbs_to_add=[rrc_msgs.DrbToAdd(drb_id=1, lcid=3, eps_bearer_id=5)],
            nas_pdu=b"np"),
        rrc_msgs.RrcConnectionReconfiguration(
            mobility=rrc_msgs.MobilityControlInfo(
                target_pci=2, new_rnti=0x47, dedicated_preamble=60,
                key_change="x2")),
        rrc_msgs.RrcConnectionReconfigurationComplete(),
        rrc_msgs.RrcConnectionRelease(cause="user-inactivity"),
        rrc_msgs.MeasurementReport(rsrp_dbm=-95.5, rsrq_db=-11.0,
                                   neigh=[(2, 7.25), (3, -1.5)]),
        rrc_msgs.Paging(ue_identity=123456789),
        rrc_msgs.RrcConnectionReestablishmentRequest(c_rnti=0x46,
                                                     cause="otherFailure"),
    ]
    for m in msgs:
        data = codec.encode(m)
        assert data[0] == codec.PER_MAGIC, type(m).__name__
        out = codec.decode(data)
        for f in dataclasses.fields(m):
            a, b = getattr(m, f.name), getattr(out, f.name)
            if isinstance(a, tuple):
                a = list(a)
            if isinstance(b, list):
                b = [tuple(x) if isinstance(x, tuple) else x for x in b]
            assert a == b, (type(m).__name__, f.name, a, b)


def test_per_is_much_smaller_than_json():
    m = rrc_msgs.RrcConnectionRequest(ue_identity=12345)
    import json

    jlen = len(json.dumps({"__t": "RrcConnectionRequest",
                           "f": {"ue_identity": 12345, "cause": "mo-Data"}}))
    assert len(codec.encode(m)) <= 7 < jlen // 5


def test_json_fallback_for_unschema_messages():
    @codec.register
    @dataclasses.dataclass
    class _NoSchemaMsg:
        x: int = 3
        s: str = "abc"

    m = _NoSchemaMsg()
    data = codec.encode(m)
    assert data[0] != codec.PER_MAGIC
    assert codec.decode(data) == m
    # NAS rides PER too now
    from srslte_emane_tpu.stack import nas_msgs

    m2 = nas_msgs.AttachRequest(imsi="001019876543210")
    d2 = codec.encode(m2)
    assert d2[0] == codec.PER_MAGIC
    assert codec.decode(d2) == m2
