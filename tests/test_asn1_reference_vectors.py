"""L3 codec interop against the reference's captured ASN.1 byte vectors.

Every vector below is copied from the byte arrays in
`lib/test/asn1/*.cc` of the reference tree (adjacentlink/srsLTE-emane) —
real encoded RRC messages its generated 36.331 codec
(`lib/src/asn1/rrc_asn1.cc`) packs/unpacks in its own test suite.  Our
schema-driven X.691 UPER runtime (`srslte_emane_tpu/stack/asn1`) must
decode each one and re-encode it byte-exact, the same TESTASSERT(memcmp)
contract the reference applies to itself.  This is the L3 counterpart of
the PHY golden-capture tests (tests/test_golden_captures.py).
"""

import math

import pytest

from srslte_emane_tpu.stack.asn1 import rrc36331 as rrc
from srslte_emane_tpu.stack.asn1.runtime import (
    BitReader, BitWriter, uper_decode, uper_encode)


def roundtrip(typ, hexstr):
    """Decode; assert full consumption mod padding; re-encode byte-exact."""
    data = bytes.fromhex(hexstr)
    r = BitReader(data)
    val = typ.dec(r)
    # decode must consume everything but sub-byte / trailing-byte padding
    assert math.ceil(r.pos / 8) <= len(data)
    assert r.pos >= 8 * (len(data) - 1) - 7
    enc = uper_encode(typ, val)
    nbytes = math.ceil(r.pos / 8)
    assert enc[:nbytes] == data[:nbytes], (
        f"re-encode mismatch:\n  got {enc[:nbytes].hex()}\n  exp "
        f"{data[:nbytes].hex()}")
    return val


def test_mib():
    # rrc_asn1_test.cc:154 test_mib_msg
    v = roundtrip(rrc.BCCH_BCH_MSG, "9464c0")
    m = v["msg"]
    assert m["dl_bw"] == "n75"
    assert m["phich_cfg"]["phich_dur"] == "extended"
    assert m["phich_cfg"]["phich_res"] == "half"
    assert m["sys_frame_num"] == "00011001"
    assert m["sched_info_sib1_br_r13"] == 6  # rel-13 field in the spare bits
    assert m["spare"] == "0000"


def test_sib1():
    # rrc_asn1_test.cc:267 test_bcch_dl_sch_msg2
    v = roundtrip(rrc.BCCH_DL_SCH_MSG, "406404e100070019b018c06010a940")
    alt, c1 = v["msg"]
    assert alt == "c1"
    assert c1[0] == "sib_type1"
    sib1 = c1[1]
    assert "p_max" not in sib1
    assert len(sib1["sched_info_list"]) == 1
    si = sib1["sched_info_list"][0]
    assert si["si_periodicity"] == "rf16"
    assert si["sib_map_info"] == ["sib_type13_v920"]


def test_sib2_sysinfo():
    # rrc_asn1_test.cc:190 test_bcch_dl_sch_msg (SystemInformation w/ SIB2)
    v = roundtrip(rrc.BCCH_DL_SCH_MSG,
                  "000149001250400800094000a03f01000a7fc9800104286c000c")
    alt, c1 = v["msg"]
    assert alt == "c1" and c1[0] == "sys_info"


def test_sysinfo_multi_sib():
    # rrc_asn1_test.cc:298 test_bcch_dl_sch_msg3
    v = roundtrip(rrc.BCCH_DL_SCH_MSG,
                  "00830992b7ec9300a3424b000c000500205d6aaaf04200c01ddc801c48"
                  "80030010a713228500")
    alt, c1 = v["msg"]
    assert alt == "c1"


def test_dl_dcch_reconfiguration_small():
    # rrc_asn1_test.cc:331 test_dl_dcch_msg
    v = roundtrip(rrc.DL_DCCH_MSG, "20021008000c406000")
    alt, c1 = v["msg"]
    assert alt == "c1"


def test_dl_ccch_connection_setup():
    # srslte_asn1_rrc_dl_ccch_test.cc:44
    v = roundtrip(rrc.DL_CCCH_MSG,
                  "6012980bfdd204fa183ed5e6c25990c1a60001314042508000f8")
    alt, c1 = v["msg"]
    assert alt == "c1"


def test_ul_dcch_measurement_report():
    # srslte_asn1_rrc_meas_test.cc:47 (UL-DCCH MeasurementReport)
    v = roundtrip(rrc.UL_DCCH_MSG, "0810493c0d978983c084208208210001bc48")
    alt, c1 = v["msg"]
    assert alt == "c1" and c1[0] == "meas_report"


def test_dl_dcch_reconfiguration_mobility():
    # srslte_asn1_rrc_dl_dcch_test.cc:44 (reconfig w/ mobilityControlInfo)
    v = roundtrip(rrc.DL_DCCH_MSG,
                  "201b3f8000000001a908800000290097800000000104221400f8020ac0"
                  "6000a00c8042029f4307dabcf84b321834c0002d68085e1800168000")
    alt, c1 = v["msg"]
    assert alt == "c1" and c1[0] == "rrc_conn_recfg"


def test_reconfiguration_r15_noncrit_chain():
    # rrc_asn1_test.cc:380 ue_rrc_conn_recfg_r15_v10_test (182 bytes)
    v = roundtrip(rrc.DL_DCCH_MSG,
                  "201695a8000005143a0002900878b0000046625a0359380000000008"
                  "3a100a48aa1a2780280002a782800002a783000002a78400000001c2"
                  "900e080848e0434b73a32b93732ba0336b73198181b0336b1b19a1a9"
                  "80233b8393982808c8005332f037f7f7d7d7f7f2f83027a12027a122"
                  "805fb2a7830400000f38900f78b962ca4f5380dfb9c0327002ea03a0"
                  "3b1793400f40010800d9809016cda8141a0020c8287000b001efb000"
                  "24a082120205024a04e3f0d00000")
    alt, c1 = v["msg"]
    assert alt == "c1" and c1[0] == "rrc_conn_recfg"


def test_failed_dl_ccch_unpack():
    # rrc_asn1_test.cc:577 failed_dl_ccch_unpack: a DL-CCCH fuzz vector
    # that historically crashed the reference codec; must decode cleanly.
    data = bytes.fromhex("a5a8d8100ec802")
    r = BitReader(data)
    rrc.DL_CCCH_MSG.dec(r)


def test_unrecognized_ext_group():
    # rrc_asn1_test.cc:590 unrecognized_ext_group_test: a SystemInformation
    # carrying unknown extension-addition groups must decode (raw-ext
    # preservation lets it survive a re-encode round trip too).
    v = roundtrip(rrc.BCCH_DL_SCH_MSG,
                  "0081198c3791901022c12940480082003267298a5aa8310018012e38"
                  "038428c5b09d4b4800")
    alt, c1 = v["msg"]
    assert alt == "c1" and c1[0] == "sys_info"


def test_mcch_area_configuration():
    # srslte_asn1_rrc_mcch_test.cc:45 (MBSFNAreaConfiguration-r9)
    v = roundtrip(rrc.MCCH_MSG,
                  "0d8fdfffffffe22ffc385e61eca80000020210002005e61eca8000004042")
    alt, c1 = v["msg"]
    assert alt == "c1"


# ---- golden vectors packed by the REFERENCE's generated rrc_asn1.cc -------
# Produced by scripts/s1ap_interop/pack_rrc.cpp (compiles the reference's
# 119k-LoC generated 36.331 codec and packs each message with fixed
# values).  Cross-decoding these caught a real wire bug: the c1
# criticalExtensions spare count varies per message (7 vs 3 spares = 3 vs
# 2 index bits) and we used 7 everywhere.

def test_refpacked_rrc_conn_reject():
    v = roundtrip(rrc.DL_CCCH_MSG, "4120")
    _, (name, m) = v["msg"]
    assert name == "rrc_conn_reject"
    assert m["crit_exts"] == ("c1", ("r8", {"wait_time": 10}))


def test_refpacked_rrc_conn_release():
    v = roundtrip(rrc.DL_DCCH_MSG, "2c02")
    _, (name, m) = v["msg"]
    assert name == "rrc_conn_release"
    assert m["rrc_transaction_id"] == 2
    assert m["crit_exts"][1][1]["release_cause"] == "other"


def test_refpacked_ue_capability_enquiry():
    v = roundtrip(rrc.DL_DCCH_MSG, "3a0000")
    _, (name, m) = v["msg"]
    assert name == "ue_cap_enquiry"
    assert m["crit_exts"][1][1]["ue_cap_request"] == ["eutra"]


def test_refpacked_security_mode_command():
    v = roundtrip(rrc.DL_DCCH_MSG, "300220")
    _, (name, m) = v["msg"]
    assert name == "security_mode_cmd"
    alg = m["crit_exts"][1][1]["security_cfg_smc"]["security_algorithm_cfg"]
    assert alg == {"ciphering_algorithm": "eea2",
                   "integrity_prot_algorithm": "eia2"}


def test_refpacked_paging():
    v = roundtrip(rrc.PCCH_MSG, "6001adeadbeef0")
    _, (name, m) = v["msg"]
    assert name == "paging"
    rec = m["paging_record_list"][0]
    assert rec["ue_identity"] == ("s_tmsi", {
        "mmec": "00011010", "m_tmsi": "11011110101011011011111011101111"})
    assert rec["cn_domain"] == "ps" and m["sys_info_mod"] == "true"


def test_refpacked_dl_info_transfer():
    v = roundtrip(rrc.DL_DCCH_MSG, "0e00283aa80d5e68")
    _, (name, m) = v["msg"]
    assert name == "dl_info_transfer"
    assert m["rrc_transaction_id"] == 3
    assert m["crit_exts"][1][1]["ded_info_type"] == (
        "ded_info_nas", b"\x07\x55\x01\xab\xcd")


def test_mcch_mbsfn_area_configuration():
    """srslte_asn1_rrc_mcch_test.cc basic_test: the reference's captured
    MCCH message (MBSFNAreaConfiguration-r9 with two common-SF
    allocations and two PMCH info entries, explicit-PLMN TMGIs)."""
    v = roundtrip(rrc.MCCH_MSG,
                  "0d8fdfffffffe22ffc385e61eca80000020210002005e61eca80000"
                  "04042")
    name, cfg = v["msg"][1]
    assert name == "mbsfn_area_cfg_r9"
    sf = cfg["common_sf_alloc_r9"]
    assert sf[0]["radioframe_alloc_period"] == "n32"
    assert sf[0]["radioframe_alloc_offset"] == 4
    assert sf[0]["sf_alloc"] == ("one_frame", "111111")
    assert sf[1]["sf_alloc"] == ("four_frames", "1" * 24)
    assert cfg["common_sf_alloc_period_r9"] == "rf256"
    p0, p1 = cfg["pmch_info_list_r9"]
    assert p0["pmch_cfg_r9"] == dict(sf_alloc_end_r9=1535, data_mcs_r9=16,
                                     mch_sched_period_r9="rf1024")
    s0 = p0["mbms_session_info_list_r9"][0]
    assert s0["tmgi_r9"]["plmn_id_r9"] == (
        "explicit_value_r9", {"mcc": [9, 8, 7], "mnc": [6, 5, 4]})
    assert s0["tmgi_r9"]["service_id_r9"] == b"\x00\x00\x01"
    assert s0["session_id_r9"] == b"\x01" and s0["lc_ch_id_r9"] == 1
    assert p1["pmch_cfg_r9"]["data_mcs_r9"] == 8
    assert p1["mbms_session_info_list_r9"][0]["lc_ch_id_r9"] == 2
