"""Channel-estimator measurement outputs: SNR, RSRQ, timing offset; and
sharded-vs-single-device result consistency on the 8-device mesh."""

import jax
import numpy as np

from srslte_emane_tpu.models import pdsch_link
from srslte_emane_tpu.ops import channel, cplx, fading, ofdm
from srslte_emane_tpu.phch import chest, grid as grid_mod, pdsch


def _rx_grid(cell, sf, key, snr_db, delay=0):
    g = pdsch.put_crs(cplx.zeros((2, 14, cell.nre)), cell, sf)
    t = ofdm.modulate(g, cell.n_prb)
    if delay:
        t = fading.apply_delay(t, delay)
    rx = channel.awgn(key, t, snr_db)
    return ofdm.demodulate(rx, cell.n_prb)


def test_snr_estimate_tracks_truth():
    """On a fully-loaded subframe the chest SNR must track the channel SNR."""
    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=25, cell_id=3, cfi=1),
        qm=2, code_rate=0.4,
    )
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, (2, cfg.tbs), dtype=np.int8)
    tx = pdsch_link.tx_subframe(payload, cfg)
    for snr in (5.0, 15.0, 25.0):
        rx = channel.awgn(jax.random.PRNGKey(int(snr)), tx, snr)
        rg = ofdm.demodulate(rx, cfg.cell.n_prb)
        ch = chest.estimate(rg, cfg.cell, cfg.sf_idx)
        est = float(np.asarray(ch.snr_db).mean())
        assert abs(est - snr) < 4.0, (snr, est)
        # fully-loaded grid: RSRQ near 0 dB; rssi has per-batch shape
        assert np.asarray(ch.rssi).shape == (2,)
        assert abs(float(np.asarray(ch.rsrq_db).mean())) < 4.0


def test_sync_error_estimates_integer_delay():
    cell = grid_mod.CellConfig(n_prb=25, cell_id=3)
    for d in (0, 2):
        rg = _rx_grid(cell, 1, jax.random.PRNGKey(d), 30.0, delay=d)
        ch = chest.estimate(rg, cell, 1)
        est = float(np.asarray(ch.sync_err).mean())
        assert abs(est - d) < 0.5, (d, est)


def test_sharded_decode_matches_single_device():
    """The ('node','sf')-sharded link step must produce identical decoded
    payloads to unsharded execution (multi-chip correctness check)."""
    from srslte_emane_tpu.parallel import mesh as mesh_mod

    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=6, cell_id=1, cfi=2),
        qm=2, code_rate=0.5, snr_db=20.0, max_iter=2,
    )
    rng = np.random.default_rng(0)
    b = 8
    payload = rng.integers(0, 2, (b, cfg.tbs), dtype=np.int8)
    key = jax.random.PRNGKey(1)

    import functools

    single = jax.jit(functools.partial(pdsch_link.link_step, cfg=cfg))
    out1, ok1, _ = single(payload, key)

    mesh = mesh_mod.make_mesh(8)
    sh = mesh_mod.batch_sharding(mesh)
    sharded = jax.jit(functools.partial(pdsch_link.link_step, cfg=cfg),
                      in_shardings=(sh, None))
    out8, ok8, _ = sharded(jax.device_put(payload, sh), key)
    assert np.asarray(ok1).all() and np.asarray(ok8).all()
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out8))
