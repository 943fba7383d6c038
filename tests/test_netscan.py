"""Traced-cell beacons: one program synthesizes N heterogeneous cells
(cell_id as data) bit-exactly vs the host-specialized builders, and the
sharded network scan identifies every dominant neighbor."""

import numpy as np
import jax
import jax.numpy as jnp

from srslte_emane_tpu.models import netscan
from srslte_emane_tpu.ops import cplx
from srslte_emane_tpu.parallel import mesh as mesh_mod
from srslte_emane_tpu.phch import grid as grid_mod, pdsch, sync


def test_traced_beacons_bitexact_vs_host_specialized():
    ids = np.array([0, 5, 6, 151, 503], np.int32)
    got = jax.jit(netscan.build_beacons)(ids)
    for i, cid in enumerate(ids):
        cell = grid_mod.CellConfig(n_prb=6, cell_id=int(cid))
        ref = cplx.zeros((1, 14, 72))
        ref = sync.put_pss_sss(ref, cell, 0)
        ref = pdsch.put_crs(ref, cell, 0)
        assert float(jnp.max(jnp.abs(got[i] - ref[0]))) == 0.0, cid


def test_sharded_network_scan_identifies_neighbors():
    mesh = mesh_mod.make_mesh(8)
    N = 16
    rng = np.random.default_rng(0)
    ids = rng.choice(504, N, replace=False).astype(np.int32)
    g = 0.05 * (rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N)))
    for i in range(N):
        g[i, (i + 1) % N] = 1.0  # one dominant neighbor per observer
    res = netscan.network_scan(mesh, ids, g.astype(np.complex64),
                               key=jax.random.PRNGKey(0), noise_std=0.02)
    want = ids[(np.arange(N) + 1) % N]
    assert (np.asarray(res["cell_id"]) == want).all()


def test_network_scan_unsharded_path():
    N = 6
    ids = np.arange(10, 10 + N, dtype=np.int32)
    g = np.zeros((N, N), np.complex64)
    for i in range(N):
        g[i, (i + 3) % N] = 1.0
    res = netscan.network_scan(None, ids, g)
    assert (np.asarray(res["cell_id"]) == ids[(np.arange(N) + 3) % N]).all()
