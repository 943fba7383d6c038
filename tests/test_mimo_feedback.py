"""RI/PMI channel feedback: UE-side PMI selection + condition-number rank
inference (precoding.h:45-129, mat.c srslte_mat_2x2_cn) riding the periodic
CQI report into the eNB scheduler context (scheduler_ue.cc)."""

import numpy as np

from srslte_emane_tpu.apps import netsim


def _attach_one():
    sysd = netsim.build_network(1, 75.0, n_prb=25)
    net, enb, ue = sysd["net"], sysd["enb"], sysd["ues"][0]
    net.run(120)
    assert ue.emm_state == "REGISTERED"
    return net, enb, ue


def test_ri2_well_conditioned_identity_channel():
    net, enb, ue = _attach_one()
    h = np.tile(np.eye(2, dtype=np.complex64), (50, 1, 1))
    ue.mimo_meas(0, h)
    assert ue._ri == 2  # cond = 0 dB -> rank 2
    net.run(40)  # at least one CQI period
    ctx = enb.ues[ue.crnti]
    assert getattr(ctx, "ri", None) == 2


def test_ri1_rank_deficient_channel_picks_matching_pmi():
    net, enb, ue = _attach_one()
    # h columns combine in phase for w = [1, +1] (PMI 0): y = h0 + w*h1
    h = np.tile(np.array([[1.0, 1.0], [1.0, 1.0]], dtype=np.complex64),
                (50, 1, 1))
    ue.mimo_meas(0, h)
    assert ue._ri == 1 and ue._pmi == 0
    # a channel whose second column is -j times the first favors w=+j (PMI 2)
    h2 = np.stack([h[..., 0], -1j * h[..., 0]], axis=-1)
    ue.mimo_meas(1, h2)
    assert ue._ri == 1 and ue._pmi == 2
    net.run(40)
    ctx = enb.ues[ue.crnti]
    assert getattr(ctx, "ri", None) == 1 and getattr(ctx, "pmi", None) == 2
