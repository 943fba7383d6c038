"""The reference's captured S1AP PDU decodes and re-encodes byte-exact
through the aligned-PER codec.

Vector from `lib/test/asn1/s1ap_test.cc:35`
(unpack_test_served_gummeis_with_multiple_plmns): an S1SetupResponse
whose ServedGUMMEIs item carries six PLMNs — the same bytes
liblte_s1ap.cc's own test unpacks."""

from srslte_emane_tpu.stack.asn1 import s1ap36413 as s1ap

S1SETUP_RESPONSE = bytes([
    0x20, 0x11, 0x00, 0x26, 0x00, 0x00, 0x02, 0x00, 0x69,
    0x00, 0x1a, 0x01, 0x40, 0x00, 0xf1, 0x10, 0x00, 0xf1,
    0x10, 0x00, 0xf1, 0x10, 0x00, 0xf1, 0x10, 0x00, 0xf1,
    0x10, 0x00, 0xf1, 0x10, 0x00, 0x00, 0x88, 0x88, 0x00,
    0x7b, 0x00, 0x57, 0x40, 0x01, 0xff])


def test_s1setup_response_decodes():
    pdu = s1ap.decode_pdu(S1SETUP_RESPONSE)
    assert pdu.pdu_type == "successfulOutcome"
    assert pdu.procedure_code == s1ap.PROC_S1SETUP
    assert pdu.criticality == "reject"
    assert [ie.id for ie in pdu.ies] == [s1ap.ID_SERVED_GUMMEIS,
                                         s1ap.ID_RELATIVE_MME_CAPACITY]
    gummeis = pdu.ies[0].value
    assert len(gummeis) == 1
    item = gummeis[0]
    assert len(item["plmns"]) == 6
    assert all(p == bytes([0x00, 0xf1, 0x10]) for p in item["plmns"])
    assert item["group_ids"] == [bytes([0x88, 0x88])]
    assert item["mme_codes"] == [bytes([0x7b])]
    assert pdu.ies[1].value == 255
    assert pdu.ies[1].criticality == "ignore"


def test_s1setup_response_reencodes_byte_exact():
    pdu = s1ap.decode_pdu(S1SETUP_RESPONSE)
    assert s1ap.encode_pdu(pdu) == S1SETUP_RESPONSE


def test_generated_pdu_roundtrip():
    """The codec also generates valid PDUs from scratch."""
    pdu = s1ap.S1apPdu(
        "successfulOutcome", s1ap.PROC_S1SETUP, "reject",
        [s1ap.ProtocolIE(s1ap.ID_MME_NAME, "ignore", "srsmme"),
         s1ap.ProtocolIE(
             s1ap.ID_SERVED_GUMMEIS, "reject",
             [dict(plmns=[bytes([0x00, 0xf1, 0x10])],
                   group_ids=[bytes([0x00, 0x01])],
                   mme_codes=[bytes([0x02])])]),
         s1ap.ProtocolIE(s1ap.ID_RELATIVE_MME_CAPACITY, "ignore", 10)])
    wire = s1ap.encode_pdu(pdu)
    back = s1ap.decode_pdu(wire)
    assert back.ies[0].value == "srsmme"
    assert back.ies[1].value[0]["mme_codes"] == [bytes([0x02])]
    assert back.ies[2].value == 10
    assert s1ap.encode_pdu(back) == wire
