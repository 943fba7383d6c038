"""Deployment-scale cell scan CLI.

Synthesizes an N-cell beacon deployment in one traced program
(`models/netscan.py`), superposes the waveforms over the (optionally
sharded) OTA medium, and runs batched cell search at every observation
point — the `srsue/src/phy/scell/intra_measure.cc` neighbor-scan role at
network scale.

Usage: python -m srslte_emane_tpu.apps.netscan_app --cells 32 [--cpu]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=16)
    ap.add_argument("--noise-std", type=float, default=0.02)
    ap.add_argument("--interferer-gain", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX CPU backend")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard cells over an n-device ('node','sf') mesh"
                         " (0 = single device)")
    args = ap.parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..models import netscan
    from ..parallel import mesh as mesh_mod

    rng = np.random.default_rng(args.seed)
    n = args.cells
    ids = rng.choice(504, n, replace=False).astype(np.int32)
    g = args.interferer_gain * (
        rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    for i in range(n):
        g[i, (i + 1) % n] = 1.0  # each observer's dominant neighbor
    mesh = mesh_mod.make_mesh(args.mesh) if args.mesh else None

    t0 = time.time()
    res = netscan.network_scan(mesh, ids, g.astype(np.complex64),
                               key=jax.random.PRNGKey(args.seed),
                               noise_std=args.noise_std)
    found = np.asarray(res["cell_id"])
    quality = np.asarray(res["quality"])
    wall = time.time() - t0
    want = ids[(np.arange(n) + 1) % n]
    print(json.dumps(dict(
        cells=n,
        correct=int((found == want).sum()),
        wall_s=round(wall, 3),
        cells_per_sec=round(n / wall, 1),
        mean_quality=round(float(quality.mean()), 2),
        backend=jax.default_backend(),
    )))
    return found


if __name__ == "__main__":
    main()
