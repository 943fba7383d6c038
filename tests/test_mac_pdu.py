"""MAC PDU wire format: 36.321 §6.1.2 subheader multiplexing + padding.

Reference behavior: lib/src/common/pdu.cc pack/parse with R/F2/E/LCID
subheaders and padding subheaders (pdu.h:277-278): 1-2 bytes short uses
that many one-byte padding subheaders at the FRONT of the header chain;
more puts a final padding subheader that owns the rest of the PDU.
"""

import pytest

from srslte_emane_tpu.stack import pdu


CASES = [
    [(0, b"rrc-connection-request")],
    [(3, b"x" * 10), (4, b"y" * 200)],
    [(pdu.LCID_SBSR, b"\x41"), (3, b"data-bytes")],
    [(pdu.LCID_CRNTI, b"\x00\x47"), (pdu.LCID_PHR, b"\x20"), (2, b"ab")],
    [],
]


@pytest.mark.parametrize("subs", CASES)
@pytest.mark.parametrize("extra", [0, 1, 2, 3, 4, 17, 200])
def test_pack_padded_roundtrip(subs, extra):
    """pack(tb_size) emits exactly tb_size bytes and unpack recovers the
    subPDUs with every padding subheader dropped."""
    if not subs and extra == 0:
        return  # an empty PDU with no room is not a TB
    plain = pdu.pack(subs)
    tb = len(plain) + extra
    padded = pdu.pack(subs, tb_size=tb)
    assert len(padded) == tb
    assert pdu.unpack(padded) == subs


def test_padding_subheader_placement():
    """1-2 bytes short -> leading one-byte padding subheaders (E=1,
    LCID=31); more -> a final padding subheader owns the rest."""
    subs = [(3, b"abcdef")]
    plain = pdu.pack(subs)
    one = pdu.pack(subs, tb_size=len(plain) + 1)
    assert one[0] == (1 << 5) | pdu.LCID_PAD
    two = pdu.pack(subs, tb_size=len(plain) + 2)
    assert two[0] == two[1] == (1 << 5) | pdu.LCID_PAD
    many = pdu.pack(subs, tb_size=len(plain) + 10)
    # header chain: explicit-length subheader for the SDU, then the
    # terminal padding subheader (E=0, LCID=31)
    assert many[0] == (1 << 5) | 3 and many[1] == 6
    assert many[2] == pdu.LCID_PAD
    assert many[3:9] == b"abcdef"
    assert many[9:] == bytes(len(many) - 9)


def test_padding_only_pdu():
    tb = pdu.pack([], tb_size=16)
    assert len(tb) == 16 and tb[0] == pdu.LCID_PAD
    assert pdu.unpack(tb) == []


def test_unpadded_image_unchanged():
    """Without tb_size the shortest legal encoding is kept: implicit
    rest-of-PDU length on the last subheader."""
    p = pdu.pack([(3, b"abc")])
    assert p == bytes([3]) + b"abc"


def test_phich_alloc_spec_mapping():
    """36.213 §9.1.2: n_group = (I_prb + n_dmrs) % N, n_seq =
    (I_prb // N + n_dmrs) % 8 (phich.c:131-134) — injective over one
    TTI's non-overlapping PUSCH allocations."""
    from srslte_emane_tpu.phch import phich

    assert phich.alloc(0, 0, 4) == (0, 0)
    assert phich.alloc(5, 0, 4) == (1, 1)
    assert phich.alloc(7, 3, 4) == (2, 4)
    # distinct lowest PRBs on a 25-PRB cell never collide
    seen = {phich.alloc(i, 0, 4) for i in range(25)}
    assert len(seen) == 25


def test_rrc_setup_sr_resource_roundtrip():
    """sr-PUCCH-ResourceIndex rides the real 36.331 UPER
    SchedulingRequestConfig and the internal codec alike."""
    from srslte_emane_tpu.stack import rrc_msgs, rrc_wire
    from srslte_emane_tpu.stack.codec import encode, decode

    for idx in (-1, 0, 21, 2047):
        msg = rrc_msgs.RrcConnectionSetup(sr_pucch_res_idx=idx)
        wire = rrc_wire.decode_dl_ccch(rrc_wire.encode_dl_ccch(msg))
        assert wire.sr_pucch_res_idx == idx
        internal = decode(encode(msg))
        assert internal.sr_pucch_res_idx == idx
