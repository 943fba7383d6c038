"""GTPv2-C byte-exact codec (29.274 subset; gtpc.cc / mme_gtpc.cc parity)."""

from srslte_emane_tpu.epc import gtpc


def test_create_session_wire_roundtrip():
    req = gtpc.create_session_request("001019876543210", 0x1234, seq=7)
    # header: version 2, TEID present
    assert req[0] == 0x48 and req[1] == gtpc.CREATE_SESSION_REQUEST
    p = gtpc.parse_create_session_request(req)
    assert p["imsi"] == "001019876543210"
    assert p["mme_teid"] == 0x1234 and p["seq"] == 7

    resp = gtpc.create_session_response("172.16.0.9", 101, 202, seq=7)
    out = gtpc.parse_create_session_response(resp)
    assert out["cause"] == gtpc.CAUSE_ACCEPTED
    assert out["ue_ip"] == "172.16.0.9"
    assert out["teid_in"] == 101 and out["teid_out"] == 202
    assert out["eps_bearer_id"] == 5


def test_tbcd_odd_length():
    assert gtpc._tbcd_decode(gtpc._tbcd("12345")) == "12345"
    assert gtpc._tbcd("123456").hex() == "214365"


def test_header_length_field():
    body = gtpc.ie(gtpc.IE_CAUSE, b"\x10\x00")
    pkt = gtpc.header(33, 0xDEAD, 3, body)
    p = gtpc.parse(pkt)
    assert p["teid"] == 0xDEAD and p["seq"] == 3
    assert p["ies"][0][0] == gtpc.IE_CAUSE
