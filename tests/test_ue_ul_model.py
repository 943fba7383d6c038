"""UE UL subframe composite (PUSCH + PUCCH + SRS in one grid) and the eNB
composite receiver (ue_ul.c / enb_ul.c parity)."""

import jax
import numpy as np

from srslte_emane_tpu.models import ue_ul
from srslte_emane_tpu.ops import channel, cplx
from srslte_emane_tpu.phch import grid as grid_mod


def test_ul_composite_pusch_pucch_srs():
    cell = grid_mod.CellConfig(n_prb=25, cell_id=3)
    l_prb = 8  # 2^3 valid transform size
    qm = 4
    tbs = (12 * l_prb * 12 * qm // 2 - 24) // 8 * 8
    cfg = ue_ul.UlSubframeConfig(
        cell=cell, sf_idx=2, rnti=0x5A, rb_start=10, l_prb=l_prb, qm=qm,
        tbs=tbs, n_pucch_1=3, srs_rb_start=4, srs_l_prb=4)
    rng = np.random.default_rng(0)
    B = 2
    tb = rng.integers(0, 2, (B, tbs), dtype=np.int8)
    ack = cplx.from_numpy(np.array([1 + 0j, -1 + 0j], dtype=np.complex64))
    tx = ue_ul.build_subframe(cfg, tb_bits=tb, ack_bits=ack)
    rx = channel.awgn(jax.random.PRNGKey(1), tx, 18.0)
    out = ue_ul.enb_receive(rx, cfg)
    payload, ok = out["pusch"]
    assert np.asarray(ok).all()
    assert (np.asarray(payload) == tb).all()
    corr = np.asarray(out["pucch_ack"])
    assert corr[0, 0] > 0.3 and corr[1, 0] < -0.3  # ACK vs NACK signs
    assert "srs_ce" in out


def test_ul_composite_pucch_only():
    cell = grid_mod.CellConfig(n_prb=25, cell_id=3)
    cfg = ue_ul.UlSubframeConfig(cell=cell, sf_idx=4, n_pucch_2=1)
    rng = np.random.default_rng(1)
    cqi = rng.integers(0, 2, (3, 6), dtype=np.int8)
    tx = ue_ul.build_subframe(cfg, cqi_bits=cqi)
    rx = channel.awgn(jax.random.PRNGKey(2), tx, 12.0)
    out = ue_ul.enb_receive(rx, cfg, n_cqi_bits=6)
    assert (np.asarray(out["pucch_cqi"]) == cqi).all()
