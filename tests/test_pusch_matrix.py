"""PUSCH parameter matrix with spec UL MCS->TBS grants — the nested
cell_prb x n_prb x mcs CMake loop equivalent (phch/test/CMakeLists.txt:240-315,
curated subset of the 'Paranoid' explosion)."""

import jax
import numpy as np
import pytest

from srslte_emane_tpu.ops import channel, ofdm
from srslte_emane_tpu.phch import grid as grid_mod, pusch, ra, sch

SNR_FOR_QM = {2: 8.0, 4: 14.0, 6: 22.0}

MATRIX = [
    (cell_prb, l_prb, mcs)
    for cell_prb, l_prb in ((25, 4), (25, 20), (50, 25), (100, 96))
    for mcs in (0, 8, 12, 20)
]

# TEST_EXTENSION=Paranoid explodes to every valid PRB count, mirroring
# phch/test/CMakeLists.txt:240-315's Paranoid mode
import os

if os.environ.get("TEST_EXTENSION") == "Paranoid":
    from srslte_emane_tpu.phch import pusch as _p

    MATRIX = [
        (cell_prb, l_prb, mcs)
        for cell_prb in (6, 15, 25, 50, 75, 100)
        for l_prb in range(1, cell_prb + 1)
        if _p.valid_n_prb(l_prb)
        for mcs in (0, 8, 12, 20)
    ]


@pytest.mark.parametrize("cell_prb,l_prb,mcs", MATRIX)
def test_pusch_mcs_prb_grid(cell_prb, l_prb, mcs):
    assert pusch.valid_n_prb(l_prb)
    cell = grid_mod.CellConfig(n_prb=cell_prb, cell_id=(cell_prb + mcs) % 504)
    sf_idx, rnti = mcs % 10, 0x200 + mcs
    qm = ra.ul_mcs_to_qm(mcs)
    tbs = ra.ul_tbs(mcs, l_prb)
    G = 12 * l_prb * pusch.N_DATA_SYMS * qm
    if tbs + 24 > G * 0.93:
        pytest.skip("code rate above 0.93")
    cfg = sch.SchConfig(tbs=tbs, G=G, Qm=qm, Nl=1)
    rng = np.random.default_rng(mcs * 7 + cell_prb)
    payload = rng.integers(0, 2, (1, tbs), dtype=np.int8)
    g = pusch.encode(payload, cfg, cell, sf_idx, rnti, 0, l_prb)
    t = ofdm.modulate(g, cell_prb)
    rx = channel.awgn(jax.random.PRNGKey(mcs), t, SNR_FOR_QM[qm])
    rg = ofdm.demodulate(rx, cell_prb)
    out, ok, _, _ = pusch.decode(rg, cfg, cell, sf_idx, rnti, 0, l_prb)
    assert np.asarray(ok).all(), f"cell={cell_prb} l={l_prb} mcs={mcs} tbs={tbs}"
    np.testing.assert_array_equal(np.asarray(out), payload)
