"""PUSCH uplink end-to-end: UE encode -> SC-FDMA -> AWGN -> eNB decode."""

import jax
import numpy as np
import pytest

from srslte_emane_tpu.ops import channel, ofdm
from srslte_emane_tpu.phch import grid as grid_mod, pusch, refsignal_ul, sch


def test_base_sequences_unit_modulus():
    for m_sc in (12, 24, 36, 300):
        for u in (0, 7, 29):
            r = refsignal_ul.base_sequence(u, 0, m_sc)
            np.testing.assert_allclose(np.abs(r), 1.0, atol=1e-6)
    # distinct groups give distinct sequences
    assert not np.allclose(
        refsignal_ul.base_sequence(0, 0, 36), refsignal_ul.base_sequence(1, 0, 36)
    )


def test_interleaver_roundtrip():
    rng = np.random.default_rng(0)
    qm = 4
    g = 12 * qm * 30
    bits = rng.integers(0, 2, (2, g), dtype=np.int8)
    il = np.asarray(pusch.interleave(bits, qm))
    assert il.shape == bits.shape and not np.array_equal(il, bits)
    back = np.asarray(pusch.deinterleave(il.astype(np.float32), qm))
    np.testing.assert_array_equal(back.astype(np.int8), bits)


@pytest.mark.parametrize("l_prb,qm,snr", [(4, 2, 6.0), (25, 4, 12.0)])
def test_pusch_link(l_prb, qm, snr):
    cell = grid_mod.CellConfig(n_prb=25, cell_id=42)
    sf_idx, rnti, rb_start = 2, 0x5A, 0
    G = 12 * l_prb * 12 * qm
    tbs = max(8, (int(G * 0.4) - 24) // 8 * 8)
    cfg = sch.SchConfig(tbs=tbs, G=G, Qm=qm, Nl=1)
    rng = np.random.default_rng(l_prb)
    payload = rng.integers(0, 2, (2, tbs), dtype=np.int8)
    g = pusch.encode(payload, cfg, cell, sf_idx, rnti, rb_start, l_prb)
    t = ofdm.modulate(g, cell.n_prb)
    rx = channel.awgn(jax.random.PRNGKey(1), t, snr)
    rg = ofdm.demodulate(rx, cell.n_prb)
    out, ok, _, noise = pusch.decode(rg, cfg, cell, sf_idx, rnti, rb_start, l_prb)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(out), payload)


def test_pusch_wrong_rnti_fails():
    cell = grid_mod.CellConfig(n_prb=6, cell_id=1)
    l_prb, qm = 4, 2
    G = 12 * l_prb * 12 * qm
    tbs = (int(G * 0.4) - 24) // 8 * 8
    cfg = sch.SchConfig(tbs=tbs, G=G, Qm=qm, Nl=1)
    rng = np.random.default_rng(9)
    payload = rng.integers(0, 2, (1, tbs), dtype=np.int8)
    g = pusch.encode(payload, cfg, cell, 1, 0x46, 0, l_prb)
    t = ofdm.modulate(g, cell.n_prb)
    rg = ofdm.demodulate(t, cell.n_prb)
    _, ok, _, _ = pusch.decode(rg, cfg, cell, 1, 0x47, 0, l_prb)
    assert not np.asarray(ok).any()
