"""Multi-device scaling structure of the 20 MHz link step.

Runs the bench-of-record pipeline (pdsch_link.link_step: encode + AWGN +
full receive chain) with the batch sharded over ('node','sf') at
n = 1/2/4/8 devices with a fixed per-device batch.  The 8 devices here are
XLA virtual CPU devices sharing one host's cores (the driver's dryrun
environment), so wall-clock throughput CANNOT scale with n — the honest
structural metric is the compiled graph itself: the per-device HLO module
is reported with its cross-device collective count.  The link step is
pure data parallelism (zero collectives), so on real chips its weak
scaling is communication-free (BASELINE.md >=80% target holds by
construction); the sharded-OTA medium (parallel/ota_collective.py) is the
one phase that pays an all_gather, measured separately by its test.

Usage: python scripts/scaling_curve.py [per_device_batch] [iters]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    import functools

    from srslte_emane_tpu.models import pdsch_link
    from srslte_emane_tpu.parallel import mesh as mesh_mod
    from srslte_emane_tpu.phch import grid as grid_mod

    per_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=100, cell_id=1, cfi=1),
        qm=6, code_rate=0.55, snr_db=20.0, sf_idx=1)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    rows = []
    for n in (1, 2, 4, 8):
        mesh = mesh_mod.make_mesh(n)
        sharding = mesh_mod.batch_sharding(mesh)
        b = n * per_dev
        payload = jax.device_put(
            rng.integers(0, 2, size=(b, cfg.tbs), dtype=np.int8), sharding)
        step = pdsch_link.make_link_step_sharded(cfg, mesh)
        compiled = step.lower(payload, key).compile()
        hlo = compiled.as_text()
        n_coll = sum(hlo.count(op) for op in
                     ("all-reduce(", "all-gather(", "all-to-all(",
                      "collective-permute(", "reduce-scatter("))
        out, ok, _ = step(payload, key)
        jax.block_until_ready(out)
        assert np.asarray(ok).all(), f"n={n} decode failed"
        t0 = time.time()
        for _ in range(iters):
            out, ok, _ = step(payload, key)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        sf_s = b / dt
        rows.append(dict(devices=n, batch=b, sf_per_s=round(sf_s, 1),
                         cross_device_collectives=n_coll))
        print(json.dumps(rows[-1]), flush=True)
    assert all(r["cross_device_collectives"] == 0 for r in rows), rows
    print(json.dumps({"link_step_collective_free": True,
                      "note": "virtual CPU devices share one host's cores; "
                              "total sf/s staying flat with n is expected "
                              "here — zero collectives is the structural "
                              "weak-scaling evidence"}))


if __name__ == "__main__":
    main()
