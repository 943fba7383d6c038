"""PDSCH parameter matrix with spec MCS->TBS grants — the
phch/test/CMakeLists.txt:97-196 test-matrix equivalent (curated subset;
the reference's 'Paranoid' mode explodes this to every PRB count)."""

import jax
import numpy as np
import pytest

from srslte_emane_tpu.models import pdsch_link
from srslte_emane_tpu.ops import channel, ofdm
from srslte_emane_tpu.phch import grid as grid_mod, pdsch, ra, sch

SNR_FOR_QM = {2: 6.0, 4: 12.0, 6: 20.0}

MATRIX = [
    (n_prb, mcs)
    for n_prb in (6, 15, 25, 50)
    for mcs in (0, 5, 9, 12, 16, 20, 26)
]

# TEST_EXTENSION=Paranoid: every bandwidth (the reference's explosion mode)
import os

if os.environ.get("TEST_EXTENSION") == "Paranoid":
    MATRIX = [
        (n_prb, mcs)
        for n_prb in (6, 15, 25, 50, 75, 100)
        for mcs in range(0, 27, 2)
    ]


@pytest.mark.parametrize("n_prb,mcs", MATRIX)
def test_pdsch_mcs_prb_grid(n_prb, mcs):
    cell = grid_mod.CellConfig(n_prb=n_prb, cell_id=(n_prb + mcs) % 504, cfi=1)
    sf_idx = 1 + (mcs % 8)
    rnti = 0x100 + mcs
    prb_mask = (1,) * n_prb
    qm = ra.dl_mcs_to_qm(mcs)
    tbs = ra.dl_tbs(mcs, n_prb)
    n_re = grid_mod.nof_re(cell, sf_idx, prb_mask)
    G = n_re * qm
    if tbs + 24 > G * 0.93:
        pytest.skip("code rate above 0.93 (reference skips too)")
    cfg = sch.SchConfig(tbs=tbs, G=G, Qm=qm, Nl=1)
    rng = np.random.default_rng(mcs * 100 + n_prb)
    payload = rng.integers(0, 2, (1, tbs), dtype=np.int8)
    g = pdsch.encode(payload, cfg, cell, sf_idx, rnti, prb_mask)
    t = ofdm.modulate(g, n_prb)
    rx = channel.awgn(jax.random.PRNGKey(mcs), t, SNR_FOR_QM[qm])
    rg = ofdm.demodulate(rx, n_prb)
    out, ok, _, _ = pdsch.decode(rg, cfg, cell, sf_idx, rnti, prb_mask)
    assert np.asarray(ok).all(), f"n_prb={n_prb} mcs={mcs} tbs={tbs}"
    np.testing.assert_array_equal(np.asarray(out), payload)


def test_mmse_equalizer_option():
    """MMSE equalization decodes at low SNR where it matters most."""
    import jax

    from srslte_emane_tpu.models import pdsch_link
    from srslte_emane_tpu.ops import channel
    from srslte_emane_tpu.phch import grid as grid_mod, pdsch

    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=15, cell_id=1, cfi=1), qm=2,
        code_rate=0.4, sf_idx=1)
    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, (2, cfg.tbs), dtype=np.int8)
    tx = pdsch_link.tx_subframe(tb, cfg)
    rx = channel.awgn(jax.random.PRNGKey(1), tx, 2.0)
    from srslte_emane_tpu.ops import ofdm

    g = ofdm.demodulate(rx, cfg.cell.n_prb)
    out, ok, _, _ = pdsch.decode(g, cfg.sch_cfg, cfg.cell, 1, cfg.rnti,
                                 cfg.prb_mask, equalizer="mmse")
    assert np.asarray(ok).all()
    assert (np.asarray(out) == tb).all()
