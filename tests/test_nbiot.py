"""NB-IoT NPSS/NSSS generation + detection."""

import numpy as np

from srslte_emane_tpu.ops import cplx
from srslte_emane_tpu.phch import sync_nbiot


def test_npss_detect():
    rng = np.random.default_rng(0)
    g = np.zeros((2, 14, 12), dtype=np.complex64)
    g[0, sync_nbiot.NPSS_SYMS[0]:, :11] = sync_nbiot.npss_grid()  # wrong slice
    g[0, :, :] = 0
    for i, l in enumerate(sync_nbiot.NPSS_SYMS):
        g[0, l, :11] = sync_nbiot.npss_grid()[i]
    g += (0.05 * (rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape))).astype(np.complex64)
    m = np.asarray(sync_nbiot.npss_detect(cplx.from_numpy(g)))
    assert m[0] > 0.9 and m[1] < 0.3


def test_nsss_detect_all_ids_sampled():
    rng = np.random.default_rng(1)
    for nid in (0, 17, 257, 503):
        for fp in (0, 3):
            s = sync_nbiot.nsss_sequence(nid, 2 * fp)
            noisy = s + 0.2 * (rng.normal(size=132) + 1j * rng.normal(size=132))
            got_id, got_fp, m = (np.asarray(v) for v in sync_nbiot.nsss_detect(
                cplx.from_numpy(noisy.astype(np.complex64)[None])))
            assert got_id[0] == nid and got_fp[0] == fp, (nid, fp, got_id, got_fp)
