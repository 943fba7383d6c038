"""End-to-end PDSCH link tests — the pdsch_test / phy_dl_test equivalents
(BASELINE.json config #1 and #2 shapes)."""

import jax
import numpy as np
import pytest

from srslte_emane_tpu.models import pdsch_link
from srslte_emane_tpu.phch import grid as grid_mod


def _run(cfg, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 2, size=(batch, cfg.tbs), dtype=np.int8)
    step = pdsch_link.make_link_step(cfg)
    out, ok, snr_est = step(payload, jax.random.PRNGKey(seed))
    return payload, np.asarray(out), np.asarray(ok), np.asarray(snr_est)


def test_siso_6prb_qpsk_noiseless_equivalent():
    """BASELINE config #1: SISO 1.4 MHz QPSK at high SNR — bit-exact."""
    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=6, cell_id=1, cfi=2),
        qm=2, code_rate=0.5, snr_db=30.0,
    )
    payload, out, ok, snr_est = _run(cfg)
    assert ok.all()
    np.testing.assert_array_equal(out, payload)
    # channel-estimator SNR should be in the right ballpark at high SNR
    assert snr_est.mean() > 15


@pytest.mark.parametrize("qm,rate,snr", [(2, 0.4, 2.0), (4, 0.5, 9.0), (6, 0.6, 16.0)])
def test_siso_6prb_mcs_sweep(qm, rate, snr):
    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=6, cell_id=2, cfi=1),
        qm=qm, code_rate=rate, snr_db=snr, sf_idx=2,
    )
    payload, out, ok, _ = _run(cfg, batch=4, seed=qm)
    assert ok.all()
    np.testing.assert_array_equal(out, payload)


def test_siso_50prb_64qam():
    """BASELINE config #2 shape: 10 MHz, 64QAM, multi-CB transport block."""
    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=50, cell_id=17, cfi=1),
        qm=6, code_rate=0.5, snr_db=18.0, sf_idx=1,
    )
    assert cfg.tbs > 6144  # forces code-block segmentation
    payload, out, ok, _ = _run(cfg)
    assert ok.all()
    np.testing.assert_array_equal(out, payload)


def test_sf0_with_pss_sss_pbch_holes():
    """Subframe 0: PDSCH must map around PSS/SSS/PBCH and still decode."""
    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=15, cell_id=3, cfi=2),
        qm=2, code_rate=0.4, snr_db=10.0, sf_idx=0,
    )
    n_all = grid_mod.nof_re(cfg.cell, 1, cfg.prb_mask)
    assert cfg.n_re < n_all  # holes actually reduced capacity
    payload, out, ok, _ = _run(cfg)
    assert ok.all()
    np.testing.assert_array_equal(out, payload)


def test_partial_prb_allocation():
    mask = tuple(1 if i % 2 == 0 else 0 for i in range(25))
    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=25, cell_id=5, cfi=3),
        qm=4, code_rate=0.5, snr_db=14.0, prb_mask=mask,
    )
    payload, out, ok, _ = _run(cfg)
    assert ok.all()
    np.testing.assert_array_equal(out, payload)
