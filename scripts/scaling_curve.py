"""Weak-scaling curve of the 20 MHz PDSCH pipeline over an n-device mesh.

Runs the full bench-of-record link step (encode -> AWGN -> decode) with the
subframe batch sharded over a ('node','sf') mesh for n = 1/2/4/8 devices at
a fixed per-device batch, and reports subframes/s and parallel efficiency.

On real multi-chip hardware this measures ICI scaling; in this image it runs
on a virtual CPU mesh (xla_force_host_platform_device_count), which
validates that the sharded program has no hidden cross-device serialization
— per-device throughput should stay ~flat as devices are added.

Usage: python scripts/scaling_curve.py [per_dev_batch] [iters] [max_devices]
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MAX_DEV = int(sys.argv[3]) if len(sys.argv) > 3 else 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={MAX_DEV}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    from srslte_emane_tpu.models import pdsch_link
    from srslte_emane_tpu.parallel import mesh as mesh_mod
    from srslte_emane_tpu.phch import grid as grid_mod

    per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=100, cell_id=1, cfi=1),
        qm=6, code_rate=0.55, snr_db=20.0)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    rows = []
    n = 1
    while n <= min(MAX_DEV, len(jax.devices())):
        mesh = mesh_mod.make_mesh(n)
        sharding = mesh_mod.batch_sharding(mesh)
        b = per_dev * n
        payload = jax.device_put(
            rng.integers(0, 2, size=(b, cfg.tbs), dtype=np.int8), sharding)
        step = jax.jit(functools.partial(pdsch_link.link_step, cfg=cfg),
                       in_shardings=(sharding, None))
        out, ok, _ = step(payload, key)
        jax.block_until_ready(out)
        assert np.asarray(ok).all()
        t0 = time.time()
        for _ in range(iters):
            out, ok, _ = step(payload, key)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        sf_s = b / dt
        rows.append(dict(devices=n, batch=b, sf_per_s=round(sf_s, 1),
                         sf_per_s_per_dev=round(sf_s / n, 1)))
        print(json.dumps(rows[-1]), flush=True)
        n *= 2
    base = rows[0]["sf_per_s_per_dev"]
    for r in rows:
        r["efficiency"] = round(r["sf_per_s_per_dev"] / base, 3)
    print(json.dumps({"weak_scaling": rows}))


if __name__ == "__main__":
    main()
