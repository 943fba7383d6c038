"""DCI pack/unpack + PDCCH blind-search roundtrips."""

import jax
import numpy as np
import pytest

from srslte_emane_tpu.ops import channel, cplx, ofdm
from srslte_emane_tpu.phch import chest, dci, grid as grid_mod, pdcch, pdsch, ra


def test_dci_1a_roundtrip():
    for n_prb in (6, 25, 100):
        d = dci.DciDl("1A", mcs=17, harq_pid=5, ndi=1, rv=2, tpc=1, rb_start=2, l_crbs=3)
        bits = dci.pack_dl(d, n_prb)
        back = dci.unpack_dl(bits, n_prb, "1A")
        assert (back.mcs, back.harq_pid, back.ndi, back.rv) == (17, 5, 1, 2)
        assert (back.rb_start, back.l_crbs) == (2, 3)


def test_dci_format0_roundtrip():
    d = dci.DciUl(mcs=11, ndi=1, tpc=2, rb_start=5, l_crbs=10, dmrs_cs=3)
    bits = dci.pack_ul(d, 50)
    assert dci.is_format0(bits)
    back = dci.unpack_ul(bits, 50)
    assert (back.mcs, back.rb_start, back.l_crbs, back.dmrs_cs) == (11, 5, 10, 3)
    assert len(bits) == len(dci.pack_dl(dci.DciDl("1A"), 50))  # equal padded size


def test_ra_riv_and_tbs():
    for n_prb in (6, 50, 100):
        for s, l in [(0, 1), (2, 3), (0, n_prb), (n_prb - 1, 1)]:
            riv = ra.riv_encode(s, l, n_prb)
            assert ra.riv_decode(riv, n_prb) == (s, l)
    assert ra.dl_tbs(0, 1) == 16
    assert ra.dl_tbs(9, 6) == ra.TBS_TABLE[9, 5]
    assert ra.dl_mcs_to_qm(9) == 2 and ra.dl_mcs_to_qm(10) == 4 and ra.dl_mcs_to_qm(17) == 6


@pytest.mark.parametrize("l_aggr,rnti", [(4, 0x46), (8, 0xFFFF), (1, 0x50)])
def test_pdcch_blind_search(l_aggr, rnti):
    cell = grid_mod.CellConfig(n_prb=25, cell_id=77, cfi=2)
    sf_idx = 3
    cands = pdcch.candidates(cell, rnti, sf_idx)
    # pick a candidate with the requested aggregation level
    pick = next((c for c in cands if c[0] == l_aggr), None)
    if pick is None:
        pytest.skip("no candidate at this L for this config")
    l, start = pick
    n_prb = cell.n_prb
    d = dci.DciDl("1A", mcs=12, harq_pid=2, ndi=1, rv=0, rb_start=1, l_crbs=4)
    bits = np.tile(dci.pack_dl(d, n_prb), (2, 1))
    g = cplx.zeros((2, grid_mod.N_SYM, cell.nre))
    g = pdcch.encode(bits, rnti, l, start, cell, sf_idx, g)
    g = pdsch.put_crs(g, cell, sf_idx)
    t = ofdm.modulate(g, cell.n_prb)
    rx = channel.awgn(jax.random.PRNGKey(0), t, 10.0)
    rg = ofdm.demodulate(rx, cell.n_prb)
    ch = chest.estimate(rg, cell, sf_idx)
    out_bits, ok, cand_list = pdcch.blind_search(rg, ch.ce, cell, sf_idx, rnti, len(bits[0]))
    ok = np.asarray(ok)
    assert ok.any(axis=1).all(), "DCI not found in blind search"
    # the transmitted candidate itself must pass (sub-aggregation prefixes of
    # the same CCEs may legitimately pass too — rate matching repeats bits)
    ci = cand_list.index((l, start))
    assert ok[:, ci].all()
    found = dci.unpack_dl(np.asarray(out_bits)[0, ci], n_prb, "1A")
    assert (found.mcs, found.rb_start, found.l_crbs) == (12, 1, 4)
    # wrong RNTI must not produce false positives
    _, ok_bad, _ = pdcch.blind_search(rg, ch.ce, cell, sf_idx, rnti ^ 0x1234, len(bits[0]))
    assert not np.asarray(ok_bad).any()


def test_dci_formats_1b_1c_1d_roundtrip():
    from srslte_emane_tpu.phch import dci

    for n_prb in (25, 50, 100):
        # 1C
        bits = dci.pack_dl_1c(8, 8, 17, n_prb)
        assert len(bits) == dci.format1c_len(n_prb)
        out = dci.unpack_dl_1c(bits, n_prb)
        assert out["tbs_idx"] == 17 and out["rb_start"] == 8
        # 1B / 1D
        d = dci.DciDl("1B", mcs=12, harq_pid=5, ndi=1, rv=2, tpc=1,
                      rb_start=4, l_crbs=10)
        for fmt, extra in (("1B", 1), ("1D", 0)):
            bits = dci.pack_dl_1bd(d, n_prb, fmt, tpmi=2, extra_bit=extra)
            assert len(bits) == dci.format1bd_len(n_prb)
            d2, tpmi, eb = dci.unpack_dl_1bd(bits, n_prb, fmt)
            assert (d2.mcs, d2.rb_start, d2.l_crbs, tpmi, eb) == (12, 4, 10, 2, extra)


def test_dci_formats_2_2a_2b_roundtrip():
    from srslte_emane_tpu.phch import dci

    for n_prb in (15, 50, 100):
        d = dci.DciDl2("2", rbg_bitmap=0b1011, tpc=2, harq_pid=6, cw_swap=1,
                       mcs1=10, ndi1=1, rv1=2, mcs2=20, ndi2=0, rv2=3,
                       precoding_info=5)
        for fmt in ("2", "2A", "2B"):
            d.format = fmt
            d.n_scid = 1 if fmt == "2B" else 0
            bits = dci.pack_dl_2(d, n_prb)
            assert len(bits) == dci.format2_len(n_prb, fmt)
            out = dci.unpack_dl_2(bits, n_prb, fmt)
            assert (out.mcs1, out.mcs2, out.rbg_bitmap, out.cw_swap) == (10, 20, 0b1011, 1)
            if fmt == "2":
                assert out.precoding_info == 5
            if fmt == "2B":
                assert out.n_scid == 1


def test_ra_type1_subset_allocation():
    from srslte_emane_tpu.phch import ra

    p = ra.rbg_size(50)  # 3
    # subset 1, no shift, first three addressable PRBs (MSB-first bitmap)
    n_type1 = -(-50 // p) - 2 - 1  # 14 for 50 PRB
    bitmap = 0b111 << (n_type1 - 3)
    m = ra.type1_to_prb_mask(1, 0, bitmap, 50)
    assert [i for i, v in enumerate(m) if v] == [3, 4, 5]
    # all selected PRBs always belong to the subset
    m = ra.type1_to_prb_mask(2, 0, (1 << n_type1) - 1, 50)
    assert all((i // p) % p == 2 for i, v in enumerate(m) if v)
    # shift addresses the subset tail
    m = ra.type1_to_prb_mask(0, 1, 0b11, 50)
    assert [i for i, v in enumerate(m) if v] == [46, 47]
