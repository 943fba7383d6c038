"""NB-IoT NPSS/NSSS generation + detection."""

import jax
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


def test_npbch_mib_nb_roundtrip():
    from srslte_emane_tpu.ops import channel
    from srslte_emane_tpu.phch import nbiot

    rng = np.random.default_rng(0)
    mib = rng.integers(0, 2, (2, nbiot.MIB_NB_BITS), dtype=np.int8)
    blocks = nbiot.npbch_encode(mib, n_id_ncell=17)
    assert blocks.shape[1:] == (8, 14, 12, 2)
    rx = channel.awgn(jax.random.PRNGKey(1), blocks, 6.0)
    out, ok = nbiot.npbch_decode(rx, 17)
    assert np.asarray(ok).all()
    assert (np.asarray(out) == mib).all()


def test_npdsch_roundtrip():
    from srslte_emane_tpu.ops import channel
    from srslte_emane_tpu.phch import nbiot

    rng = np.random.default_rng(1)
    tbs = 208  # a valid NB-IoT TBS-class size
    tb = rng.integers(0, 2, (3, tbs), dtype=np.int8)
    sfs = nbiot.npdsch_encode(tb, n_sf=4, n_id_ncell=5, rnti=0x51)
    assert sfs.shape[1:] == (4, 14, 12, 2)
    rx = channel.awgn(jax.random.PRNGKey(2), sfs, 12.0)
    out, ok = nbiot.npdsch_decode(rx, tbs, 5, 0x51)
    assert np.asarray(ok).all()
    assert (np.asarray(out) == tb).all()


def test_npdsch_fails_with_wrong_cell():
    from srslte_emane_tpu.ops import channel
    from srslte_emane_tpu.phch import nbiot

    rng = np.random.default_rng(2)
    tb = rng.integers(0, 2, (1, 104), dtype=np.int8)
    sfs = nbiot.npdsch_encode(tb, n_sf=2, n_id_ncell=5, rnti=0x51)
    rx = channel.awgn(jax.random.PRNGKey(3), sfs, 8.0)
    _, ok = nbiot.npdsch_decode(rx, 104, 6, 0x51)  # wrong n_id_ncell
    assert not np.asarray(ok).any()
