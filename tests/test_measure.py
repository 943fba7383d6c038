"""Neighbor-cell RSRP measurement over superposed cells."""

import jax
import numpy as np

from srslte_emane_tpu.models import measure
from srslte_emane_tpu.ops import channel, cplx, ofdm
from srslte_emane_tpu.phch import grid as grid_mod, pdsch


def test_measure_two_cells():
    n_prb, sf = 6, 1
    g_a = pdsch.put_crs(cplx.zeros((1, 14, 12 * n_prb)), grid_mod.CellConfig(n_prb=n_prb, cell_id=11), sf)
    g_b = pdsch.put_crs(cplx.zeros((1, 14, 12 * n_prb)), grid_mod.CellConfig(n_prb=n_prb, cell_id=303), sf)
    # cell B 10 dB weaker
    combined = g_a + g_b * np.sqrt(0.1)
    t = ofdm.modulate(combined, n_prb)
    rx = channel.awgn(jax.random.PRNGKey(0), t, 20.0)
    rg = ofdm.demodulate(rx, n_prb)
    best, meas = measure.strongest_cell(rg, n_prb, sf, [11, 303, 42])
    assert best[0] == 11
    rsrp_a = float(np.asarray(meas[11][0])[0])
    rsrp_b = float(np.asarray(meas[303][0])[0])
    rsrp_x = float(np.asarray(meas[42][0])[0])
    ratio_db = 10 * np.log10(rsrp_a / rsrp_b)
    assert 6 < ratio_db < 14, ratio_db  # ~10 dB apart
    assert rsrp_x < rsrp_b  # absent cell measures lowest
