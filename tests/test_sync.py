"""PSS/SSS cell search on synthesized waveforms."""

import jax
import numpy as np
import pytest

from srslte_emane_tpu.ops import channel, cplx, ofdm
from srslte_emane_tpu.phch import grid as grid_mod, pdsch, sync


def _make_sf(cell, sf_idx, key, snr_db, delay=0):
    g = cplx.zeros((1, grid_mod.N_SYM, cell.nre))
    g = sync.put_pss_sss(g, cell, sf_idx)
    g = pdsch.put_crs(g, cell, sf_idx)
    t = ofdm.modulate(g, cell.n_prb)
    t = channel.awgn(key, t, snr_db)
    if delay:
        t = np.concatenate([np.zeros((1, delay, 2), np.float32), np.asarray(t)], axis=1)
    return t


def test_pss_sequences_distinct():
    for i in range(3):
        assert np.abs(sync.pss_freq(i)).max() <= 1.0 + 1e-6
    assert not np.allclose(sync.pss_freq(0), sync.pss_freq(1))


def test_sss_sequences_bipolar_unique():
    seqs = {tuple(sync.sss_sequence(n1, 0, 0)) for n1 in range(168)}
    assert len(seqs) == 168


@pytest.mark.parametrize("cell_id,sf_idx,delay", [(0, 0, 0), (301, 0, 37), (17, 5, 100)])
def test_cell_search(cell_id, sf_idx, delay):
    cell = grid_mod.CellConfig(n_prb=6, cell_id=cell_id)
    t = _make_sf(cell, sf_idx, jax.random.PRNGKey(cell_id), 10.0, delay)
    res = sync.cell_search(jnp_arr(t))
    assert int(res["n_id_2"][0]) == cell_id % 3
    assert int(res["n_id_1"][0]) == cell_id // 3
    assert int(res["cell_id"][0]) == cell_id
    assert int(res["sf_idx"][0]) == sf_idx
    expected_pos = sync.pss_symbol_start(6) + delay
    assert abs(int(res["pss_pos"][0]) - expected_pos) <= 1


def jnp_arr(x):
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(x))


def test_cell_search_batched_cells():
    """Batch different delays of the same cell — the batched-hypothesis mode."""
    cell = grid_mod.CellConfig(n_prb=6, cell_id=42)
    sfs = [np.asarray(_make_sf(cell, 0, jax.random.PRNGKey(i), 5.0, d))[:, :2100]
           for i, d in enumerate((0, 50, 150))]
    batch = np.concatenate([np.pad(s, ((0, 0), (0, 2100 - s.shape[1]), (0, 0))) for s in sfs])
    res = sync.cell_search(jnp_arr(batch))
    assert (np.asarray(res["cell_id"]) == 42).all()
