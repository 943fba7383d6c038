"""The reference's captured NAS byte vectors decode and re-encode
byte-exact through the 24.301 wire codec.

Vectors from `lib/test/asn1/srslte_asn1_nas_test.cc:52` (dedicated bearer)
and `srsue/test/upper/rrc_reconfig_test.cc:45` (attach accept with
embedded default-bearer activation) — the same bytes liblte_mme.cc's own
test suite pins."""

from srslte_emane_tpu.stack.asn1 import nas24301 as nas

# srslte_asn1_nas_test.cc: Activate Dedicated EPS Bearer Context Request
DEDICATED = bytes([
    0x27, 0x35, 0x11, 0xfd, 0xf6, 0x07, 0x62, 0x00, 0xc5, 0x05, 0x01, 0x01,
    0x07, 0x21, 0x31, 0x00, 0x03, 0x40, 0x08, 0xae, 0x5d, 0x02, 0x00, 0xc2,
    0x81, 0x34, 0x01, 0x4d])

# rrc_reconfig_test.cc: Attach Accept (GUTI, T3402/T3423, feature support)
# with the Activate Default EPS Bearer Context Request in its ESM container
ATTACH_ACCEPT = bytes([
    0x27, 0x4f, 0xab, 0xef, 0x59, 0x01, 0x07, 0x42, 0x01, 0x49, 0x06, 0x40,
    0x00, 0xf1, 0x10, 0x31, 0x32, 0x00, 0x22, 0x52, 0x01, 0xc1, 0x05, 0x07,
    0xff, 0xff, 0xff, 0xff, 0x0c, 0x0b, 0x76, 0x7a, 0x77, 0x69, 0x6e, 0x74,
    0x65, 0x72, 0x6e, 0x65, 0x74, 0x05, 0x01, 0x0e, 0x0e, 0x0e, 0x01, 0x5e,
    0x04, 0xfe, 0xfe, 0x81, 0x4e, 0x50, 0x0b, 0xf6, 0x00, 0xf1, 0x10, 0x00,
    0x02, 0x01, 0x01, 0x00, 0x00, 0x62, 0x17, 0x2c, 0x59, 0x49, 0x64, 0x01,
    0x03])


def test_dedicated_bearer_request_byte_exact():
    m = nas.decode(DEDICATED)
    assert m["security_header"] == 2  # integrity + ciphered
    inner = m["inner"]
    assert inner["msg_name"] == "activate_dedicated_eps_bearer_context_request"
    assert inner["eps_bearer_id"] == 6
    assert inner["pti"] == 0
    # the C test's assertions (srslte_asn1_nas_test.cc:70-101)
    assert inner["linked_ebi"][0] == 0  # spare layout: (hi, lo)=(0, 5)
    assert inner["linked_ebi"][1] == 5
    assert inner["eps_qos"] == bytes([0x01])  # QCI 1
    tft = nas.parse_tft(inner["tft"])
    assert tft["op_code"] == 1  # create new TFT
    assert len(tft["filters"]) == 1
    f = tft["filters"][0]
    assert f["id"] == 1 and f["direction"] == 3  # bidirectional
    assert f["components"][0] == 0x40  # single local port type
    assert int.from_bytes(f["components"][1:3], "big") == 2222
    assert inner["transaction_id"] is not None
    assert inner["radio_priority"] == 1
    assert inner["packet_flow_id"] == bytes([0x4d])
    assert nas.encode(m) == DEDICATED


def test_attach_accept_byte_exact():
    m = nas.decode(ATTACH_ACCEPT)
    inner = m["inner"]
    assert inner["msg_name"] == "attach_accept"
    assert inner["attach_result"][1] == 1  # EPS-only attach
    assert inner["t3412"] == bytes([0x49])
    guti = nas.parse_guti(inner["guti"])
    assert guti["plmn"] == "00f110"
    assert guti["mme_group_id"] == 2 and guti["mme_code"] == 1
    assert guti["m_tmsi"] == 0x01000062
    assert inner["t3402"] == bytes([0x2c])
    assert inner["t3423"] == bytes([0x49])
    assert inner["eps_network_feature_support"] == bytes([0x03])
    # embedded ESM: default bearer to vzwinternet at 14.14.14.1
    esm = inner["esm"]
    assert esm["msg_name"] == "activate_default_eps_bearer_context_request"
    assert esm["eps_bearer_id"] == 5 and esm["pti"] == 1
    assert nas.parse_apn(esm["apn"]) == "vzwinternet"
    addr = nas.parse_pdn_address(esm["pdn_address"])
    assert addr == dict(type="ipv4", ipv4="14.14.14.1")
    assert esm["apn_ambr"] == bytes([0xfe, 0xfe, 0x81, 0x4e])
    assert nas.encode(m) == ATTACH_ACCEPT


def test_generated_attach_accept_decodes():
    """The codec also GENERATES valid wire messages: build an attach
    accept from scratch, decode it back."""
    esm = dict(protocol_discriminator=nas.PD_ESM, eps_bearer_id=5, pti=1,
               msg_type=nas.ACT_DEFAULT_BEARER_REQ,
               eps_qos=bytes([9]),
               apn=bytes([3]) + b"srs",
               pdn_address=bytes([1, 10, 0, 0, 2]))
    msg = dict(protocol_discriminator=nas.PD_EMM,
               msg_type=nas.ATTACH_ACCEPT,
               attach_result=(0, 1), t3412=bytes([0x21]),
               tai_list=bytes([0x40, 0x00, 0xf1, 0x10, 0x00, 0x01]),
               esm_container=nas.encode(esm),
               guti=bytes.fromhex("f600f110000201000000ff"))
    wire = nas.encode(msg)
    back = nas.decode(wire)
    assert back["msg_name"] == "attach_accept"
    assert nas.parse_apn(back["esm"]["apn"]) == "srs"
    assert nas.parse_guti(back["guti"])["m_tmsi"] == 0xFF
    assert nas.encode(back) == wire


# ---- Spec-derived vectors for messages ABSENT from the reference codec ----
# liblte_mme.cc defines the constants for TAU Request, Service Accept and
# CS Service Notification but generates NO pack/unpack for them, so no
# differential oracle exists (docs/INTEROP.md).  These byte strings are
# hand-derived from 24.301 §8.2.29 / §8.2.17 / §8.2.9 IE tables.

# TAU Request: plain EMM header (PD=7), type 0x48, NAS-KSI=5 in the high
# nibble + EPS-update-type=0 (TA updating) in the low nibble, old GUTI as
# the LV EPS-mobile-identity (0xF6 = even digits + GUTI), then optional
# last-visited-TAI (TV 0x52) and DRX parameter (TV 0x5C)
TAU_REQUEST_SPEC = bytes([
    0x07, 0x48, 0x50,
    0x0B, 0xF6, 0x00, 0xF1, 0x10, 0x00, 0x02, 0x01,
    0x01, 0x02, 0x03, 0x04,
    0x52, 0x00, 0xF1, 0x10, 0x00, 0x01,
    0x5C, 0x0A, 0x00])

# Service Accept: type 0x4F + optional EPS-bearer-context-status TLV
# (0x57, 2 octets; EBI 5 active = bit 5 of the first status octet)
SERVICE_ACCEPT_SPEC = bytes([0x07, 0x4F, 0x57, 0x02, 0x20, 0x00])

# CS Service Notification: type 0x64, mandatory 1-octet paging identity
# (0x01 = TMSI), optional CLI (TLV 0x60, BCD number), SS code (TV 0x61)
# and LCS indicator (TV 0x62, 0x01 = MT-LR)
CS_SERVICE_NOTIFICATION_SPEC = bytes([
    0x07, 0x64, 0x01,
    0x60, 0x05, 0x21, 0x43, 0x65, 0x87, 0x09,
    0x61, 0x11, 0x62, 0x01])


def test_tau_request_spec_vector_byte_exact():
    m = nas.decode(TAU_REQUEST_SPEC)
    inner = m  # plain (unprotected) message: flat decode
    assert inner["msg_name"] == "tracking_area_update_request"
    ksi, upd = inner["ksi_update_type"]
    assert (ksi, upd) == (5, 0)  # KSI 5, TA-updating
    assert inner["old_guti"][0] == 0xF6  # even + GUTI type
    assert inner["old_guti"][-4:] == bytes([0x01, 0x02, 0x03, 0x04])
    assert inner["last_visited_tai"] == bytes([0x00, 0xF1, 0x10, 0x00, 0x01])
    assert inner["drx_parameter"] == bytes([0x0A, 0x00])
    assert nas.encode(m) == TAU_REQUEST_SPEC


def test_service_accept_spec_vector_byte_exact():
    m = nas.decode(SERVICE_ACCEPT_SPEC)
    inner = m
    assert inner["msg_name"] == "service_accept"
    assert inner["eps_bearer_context_status"] == bytes([0x20, 0x00])
    assert nas.encode(m) == SERVICE_ACCEPT_SPEC


def test_cs_service_notification_spec_vector_byte_exact():
    m = nas.decode(CS_SERVICE_NOTIFICATION_SPEC)
    inner = m
    assert inner["msg_name"] == "cs_service_notification"
    assert inner["paging_identity"] == bytes([0x01])
    assert inner["cli"] == bytes([0x21, 0x43, 0x65, 0x87, 0x09])
    assert inner["ss_code"] == bytes([0x11])
    assert inner["lcs_indicator"] == bytes([0x01])
    assert nas.encode(m) == CS_SERVICE_NOTIFICATION_SPEC
