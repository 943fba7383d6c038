"""Composite node models: full eNB subframe (sync + PBCH + PCFICH + PDCCH +
PDSCH + PHICH) decoded end-to-end by the full UE receiver — the
phy_dl_test.c / pdsch_pdcch_file_test equivalent."""

import jax
import numpy as np

from srslte_emane_tpu.models import enb_dl, ue_dl
from srslte_emane_tpu.ops import channel
from srslte_emane_tpu.phch import grid as grid_mod, pbch, pdcch


def test_full_dl_subframe_sf0():
    cell = grid_mod.CellConfig(n_prb=25, cell_id=123, cfi=2)
    rnti = 0x46
    cands = pdcch.candidates(cell, rnti, 0)
    l_aggr, cce = next(c for c in cands if c[0] == 4)
    prb_mask = tuple(1 if 4 <= i < 12 else 0 for i in range(25))
    n_re = grid_mod.nof_re(cell, 0, prb_mask)
    tbs = (n_re * 2 // 3) // 8 * 8
    cfg = enb_dl.DlSubframeConfig(
        cell=cell, sf_idx=0,
        grants=((rnti, prb_mask, 2, tbs, l_aggr, cce),),
        with_pbch_sfn=8, phich_groups=1,
    )
    B = 2
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, (B, tbs), dtype=np.int8)
    mib = np.tile(pbch.pack_mib(25, 8), (B, 1))
    acks = np.ones((B, 1, 8), np.float32)
    tx = enb_dl.build_subframe(cfg, [payload], mib_bits=mib, acks=acks)
    rx = channel.awgn(jax.random.PRNGKey(1), tx, 14.0)

    res, _ = ue_dl.decode_subframe(rx, cfg, with_phich=True)
    assert (np.asarray(res.cfi) == 2).all()
    assert np.asarray(res.dci_found).all()
    assert np.asarray(res.crc_ok[0]).all()
    np.testing.assert_array_equal(np.asarray(res.payloads[0]), payload)
    assert (np.sign(np.asarray(res.phich)[:, 0, :]) > 0).all()  # group 0 ACKs
    # MIB also decodes from the same capture
    from srslte_emane_tpu.ops import ofdm
    from srslte_emane_tpu.phch import chest
    g = ofdm.demodulate(rx, cell.n_prb)
    ch = chest.estimate(g, cell, 0)
    mib_out, ports, off, ok = pbch.decode(g, ch.ce, cell)
    assert np.asarray(ok).all() and (np.asarray(off) == 0).all()
    np.testing.assert_array_equal(np.asarray(mib_out), mib)


def test_two_ue_grants_same_subframe():
    cell = grid_mod.CellConfig(n_prb=25, cell_id=5, cfi=2)
    sf = 4
    g1 = tuple(1 if i < 8 else 0 for i in range(25))
    g2 = tuple(1 if 12 <= i < 25 else 0 for i in range(25))
    r1, r2 = 0x50, 0x51
    c1 = next(c for c in pdcch.candidates(cell, r1, sf) if c[0] == 2)
    c2 = next(c for c in pdcch.candidates(cell, r2, sf) if c[0] == 2
              and c[1] != c1[1])
    n1 = grid_mod.nof_re(cell, sf, g1)
    n2 = grid_mod.nof_re(cell, sf, g2)
    tbs1 = (n1 * 2 // 3) // 8 * 8
    tbs2 = (n2 * 4 // 3) // 8 * 8
    cfg = enb_dl.DlSubframeConfig(
        cell=cell, sf_idx=sf,
        grants=((r1, g1, 2, tbs1, *c1), (r2, g2, 4, tbs2, *c2)),
    )
    rng = np.random.default_rng(1)
    p1 = rng.integers(0, 2, (2, tbs1), dtype=np.int8)
    p2 = rng.integers(0, 2, (2, tbs2), dtype=np.int8)
    tx = enb_dl.build_subframe(cfg, [p1, p2])
    rx = channel.awgn(jax.random.PRNGKey(2), tx, 16.0)
    res, _ = ue_dl.decode_subframe(rx, cfg)
    for gi, p in enumerate((p1, p2)):
        assert np.asarray(res.dci_found)[:, gi].all()
        assert np.asarray(res.crc_ok[gi]).all()
        np.testing.assert_array_equal(np.asarray(res.payloads[gi]), p)
