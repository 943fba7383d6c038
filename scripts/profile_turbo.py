"""Micro-profile of the turbo-decode path on TPU (honest methodology:
N-iteration loop + one final 1-element readback; block_until_ready is not
trusted on the axon tunnel).

Usage: python scripts/profile_turbo.py [n_cb] [k] [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(name, fn, args, iters, readback):
    import jax

    out = fn(*args)
    readback(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    readback(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms/iter", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from srslte_emane_tpu.ops.fec import crc, turbodecoder, turbodecoder_pallas

    n_cb = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5568
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    rng = np.random.default_rng(0)
    # random LLRs are fine for timing fixed-iteration runs
    d = [jax.device_put(rng.normal(size=(n_cb, k + 4)).astype(np.float32))
         for _ in range(3)]
    ls, lp = d[0][:, :k], d[1][:, :k]
    tails = [jax.device_put(rng.normal(size=(n_cb, 3)).astype(np.float32))
             for _ in range(2)]
    valid = jnp.ones((n_cb,), bool)
    np.asarray(d[2][0, 0])

    # slice on DEVICE before the host copy: np.asarray(full_leaf) would pull
    # the whole array through the tunnel and poison the numbers
    rb = lambda o: np.asarray(
        jax.tree_util.tree_leaves(o)[0].reshape(-1)[:1])

    use_pallas = jax.default_backend() == "tpu"
    print(f"# n_cb={n_cb} k={k} W={turbodecoder._pick_windows(k)} "
          f"pallas={use_pallas}", flush=True)

    map_p = jax.jit(turbodecoder_pallas.map_decode_pallas)
    t_map = timeit("map_decode_pallas (half-iter)", map_p,
                   (ls, lp, tails[0], tails[1]), iters, rb)

    try:
        from srslte_emane_tpu.ops.fec import turbodecoder_pallas2
        map_p2 = jax.jit(turbodecoder_pallas2.map_decode_pallas2)
        timeit("map_decode_pallas2 (half-iter)", map_p2,
               (ls, lp, tails[0], tails[1]), iters, rb)
    except Exception as e:
        print(f"# pallas2 failed: {type(e).__name__}: {e}", flush=True)

    map_x = jax.jit(turbodecoder._map_decode)
    timeit("xla _map_decode (half-iter)", map_x,
           (ls, lp, tails[0], tails[1]), max(4, iters // 4), rb)

    for n_it in (1, 2):
        t = timeit(
            f"turbo_decode fixed {n_it} iter",
            jax.jit(lambda a, b, c, v, n=n_it: turbodecoder.turbo_decode(
                a, b, c, v, k, n, None, use_pallas=use_pallas)),
            (d[0], d[1], d[2], valid), iters, rb)
    glue = t - 2 * 2 * t_map  # 2 iters = 4 half-iters
    print(f"# glue per fixed-2-iter call ~ {glue:.2f} ms "
          f"(kernels {4 * t_map:.2f})", flush=True)

    timeit("turbo_decode early-stop max8 (random llr)",
           jax.jit(lambda a, b, c, v: turbodecoder.turbo_decode(
               a, b, c, v, k, 8, crc.LTE_CRC24B, use_pallas=use_pallas)),
           (d[0], d[1], d[2], valid), iters, rb)


if __name__ == "__main__":
    main()
