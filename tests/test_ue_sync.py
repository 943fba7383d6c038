"""UE sync state machine over a CFO+delay-impaired stream."""

import jax
import numpy as np

from srslte_emane_tpu.models import ue_sync
from srslte_emane_tpu.ops import channel, cplx, fading, ofdm
from srslte_emane_tpu.phch import grid as grid_mod, pbch, pdsch, sync


def _make_stream(cell, sfn0, n_sf, snr_db, cfo_hz, delay, key):
    sfs = []
    for i in range(n_sf):
        sf_idx = i % 10
        sfn = sfn0 + i // 10
        g = cplx.zeros((1, 14, cell.nre))
        g = sync.put_pss_sss(g, cell, sf_idx)
        g = pdsch.put_crs(g, cell, sf_idx)
        if sf_idx == 0:
            mib = pbch.pack_mib(cell.n_prb, sfn)[None]
            g = pbch.encode(mib, cell, sfn, g)
        sfs.append(np.asarray(ofdm.modulate(g, cell.n_prb))[0])
    t = np.concatenate(sfs, axis=0)
    t = np.asarray(channel.awgn(key, cplx.from_numpy(cplx.to_numpy(t)[None]), snr_db))[0]
    x = cplx.to_numpy(t)
    if cfo_hz:
        srate = ofdm.params(cell.n_prb)["sf_len"] * 1000.0
        x = x * np.exp(2j * np.pi * cfo_hz * np.arange(len(x)) / srate)
    return np.concatenate([np.zeros(delay, np.complex64), x])


def test_ue_sync_acquires_and_camps():
    cell = grid_mod.CellConfig(n_prb=6, cell_id=93)
    sfn0 = 32
    x = _make_stream(cell, sfn0, 25, snr_db=10.0, cfo_hz=150.0, delay=77,
                     key=jax.random.PRNGKey(0))
    s = ue_sync.UeSync(n_prb=6)
    sf_len = 1920
    state = None
    for i in range(20):
        chunk = x[i * sf_len : (i + 2) * sf_len]
        if len(chunk) < sf_len:
            break
        state = s.step(chunk[:sf_len + 200] if s.s.state != "CELL_SEARCH" else x[i*sf_len:(i+2)*sf_len])
        if state.state == "CAMPING":
            break
    assert state is not None and state.state == "CAMPING", vars(s.s)
    assert state.cell_id == 93
    assert state.sfn % 1024 >= 0
    assert abs(state.cfo_hz - 150.0) < 80.0, state.cfo_hz


def test_sfo_estimate():
    """sfo.c srslte_sfo_estimate: mean PSS timing drift per period."""
    period = 5 * 1920
    est = ue_sync.sfo_estimate([2, 2, 2, 2], period)
    assert abs(est - 2 / period) < 1e-12
    assert ue_sync.sfo_estimate([], period) == 0.0
    # systematic 1-sample drift with +-1 jitter still averages out
    est = ue_sync.sfo_estimate([1, 2, 0, 1, 1, 2, 0, 1], period)
    assert abs(est - 1 / period) < 0.3 / period


def test_sfo_tracked_from_skewed_stream():
    """A receiver clock 104 ppm FAST consumes one extra stream sample per
    5 ms tracking period, so the PSS lands ~1 sample early each period;
    sfo_ppm must report the signed clock error."""
    cell = grid_mod.CellConfig(n_prb=6, cell_id=93)
    x = _make_stream(cell, 32, 40, snr_db=20.0, cfo_hz=0.0, delay=0,
                     key=jax.random.PRNGKey(1))
    s = ue_sync.UeSync(n_prb=6)
    sf_len = 1920
    skew = 0
    state = None
    for i in range(36):
        if s.s.state == "CAMPING" and i % 5 == 0:
            skew += 1  # one extra sample of delay per 5 subframes
        chunk = x[i * sf_len + skew : (i + 2) * sf_len + skew]
        if len(chunk) < sf_len:
            break
        state = s.step(chunk)
    assert state is not None and state.state == "CAMPING", vars(s.s)
    want_ppm = -1e6 / (5 * sf_len)  # ~ -104 ppm (fast clock)
    assert 2.0 * want_ppm < state.sfo_ppm < 0.3 * want_ppm, state.sfo_ppm
