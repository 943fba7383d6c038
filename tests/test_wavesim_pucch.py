"""Waveform-mode PUCCH (UlControlPlane): superposed format-1a transmissions
from many UEs separate via cyclic shifts / orthogonal covers at the eNB
matched filter (pucch.c + enb_ul.c get_pucch behavior)."""

import numpy as np

from srslte_emane_tpu.phch import grid as grid_mod
from srslte_emane_tpu.runtime import wavesim


def _plane(n_ues, n_prb=25):
    cell = grid_mod.CellConfig(n_prb=n_prb, cell_id=17)
    cp = wavesim.UlControlPlane(cell)
    for u in range(n_ues):
        cp.add_ue(100 + u, u)
    return cp


def test_simultaneous_acks_separate_and_dtx_detected():
    cp = _plane(12)
    tx = {100 + u: (u % 2) for u in range(10)}  # two UEs silent
    pl = {100 + u: 90.0 for u in range(12)}
    res = cp.step(tx, pl)
    for u in range(10):
        det, ack, metric = res[100 + u]
        assert det and ack == (u % 2), (u, res[100 + u])
        assert metric > 20.0
    for u in (10, 11):
        det, _, metric = res[100 + u]
        assert not det and metric < 10.0, (u, res[100 + u])


def test_near_far_power_imbalance():
    """A strong UE on the same PRB must not mask a 30 dB weaker one: the
    cyclic-shift orthogonality holds under power imbalance."""
    cp = _plane(2)
    res = cp.step({100: 1, 101: 0}, {100: 70.0, 101: 100.0})
    assert res[100] == (True, 1, res[100][2])
    det, ack, _ = res[101]
    assert det and ack == 0, res[101]
