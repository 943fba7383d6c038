"""Paced (real-time) block-mode latency benchmark.

The throughput benches measure back-to-back block dispatch; a deployed
emulation must instead produce each T-TTI block ON TIME: one block every
T milliseconds at the LTE 1 kHz TTI cadence (the reference paces its
sf_worker pipeline off the RF/ZMQ sample clock; srslte-emane drives it
from the EMANE timing service).  This bench runs the device-resident
waveform block (runtime/waveblock.py) under that pacing discipline and
reports what matters for real-time operation:

  - deadline misses under double-buffered pacing: block k is dispatched
    at tick k and its results must be HOST-VISIBLE before tick k+1 (the
    depth-1 pipeline a real MAC would run: schedule block k+1 while the
    device computes block k)
  - per-block device compute time (back-to-back, dispatch amortized)
    and compute headroom = T ms / compute  (>= 2.0 means the chip could
    run the cell at twice real time with every deadline met)
  - serialized round-trip latency (dispatch -> sync), which on this
    testbed includes the axon tunnel's ~25 ms RPC round trip — reported
    separately so the transport cost is not booked against the device
    (a tiny 15 PRB x 2 UE block measures the same ~26 ms floor)

Payload buffers are double-buffered device-resident arrays; the host's
per-block work is one async dispatch (~RPC enqueue) + one sync on the
previous block, so the device computes while the host sleeps.

Prints one JSON line:
  {"metric": "waveform_paced_headroom_x", "value": ..., ...}

Usage: python scripts/bench_waveform_paced.py [n_prb] [n_ues] [T] [blocks]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from srslte_emane_tpu.phch import grid as grid_mod, pdcch, pusch
    from srslte_emane_tpu.runtime import waveblock

    n_prb = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_ues = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    n_blocks = int(sys.argv[4]) if len(sys.argv) > 4 else 100

    cell = grid_mod.CellConfig(n_prb=n_prb, cell_id=1, cfi=1)
    n_cce = pdcch.n_cce(cell)
    c0, c1 = waveblock.centre_prbs(n_prb)
    dl_starts, dl_w = waveblock._pack_segments(
        n_prb, n_ues, [(0, c0), (c1, n_prb)])
    ul_w = max(1, (n_prb - 2) // n_ues)
    while ul_w > 1 and not pusch.valid_n_prb(ul_w):
        ul_w -= 1
    cfg = waveblock.BlockConfig(
        cell=cell, rntis=tuple(70 + i for i in range(n_ues)),
        dl_rb_start=dl_starts, dl_l_crbs=dl_w, dl_mcs=20,
        ul_rb_start=tuple(1 + ul_w * i for i in range(n_ues)),
        ul_l_prb=ul_w, ul_mcs=20,
        ack_res=tuple(n_cce + i for i in range(n_ues)),
        snr_db=(30.0,) * n_ues, T=T,
        use_pallas=jax.default_backend() == "tpu", llr_bits=16)
    bench = waveblock.make_bench_step(cfg, sfn0=4)

    rng = np.random.default_rng(0)
    # double-buffered device-resident payloads: the paced loop only
    # rotates references, never uploads through the host link
    bufs = [
        (jax.device_put(rng.integers(0, 2, (T, n_ues, cfg.dl_tbs), np.int8)),
         jax.device_put(rng.integers(0, 2, (T, n_ues, cfg.ul_tbs), np.int8)))
        for _ in range(2)]
    keys = [jax.device_put(jax.random.PRNGKey(s)) for s in range(2)]
    tti0s = [jax.device_put(jnp.asarray((k * T) % 10240, jnp.int32))
             for k in range(n_blocks)]

    # warm: compile + one hot call
    t0 = time.time()
    d_ok, u_ok, a_ok = bench(bufs[0][0], bufs[0][1], keys[0], tti0s[0])
    jax.block_until_ready(d_ok)
    compile_s = time.time() - t0
    assert int(d_ok) == T * n_ues and int(u_ok) == T * n_ues
    jax.block_until_ready(bench(bufs[1][0], bufs[1][1], keys[1], tti0s[1]))

    # 1) device compute per block: back-to-back dispatch (async queue
    # keeps the chip busy; per-call transport cost amortizes away)
    iters = 10
    t0 = time.perf_counter()
    for k in range(iters):
        out = bench(*bufs[k % 2], keys[k % 2], tti0s[k % n_blocks])
    jax.block_until_ready(out)
    compute_ms = (time.perf_counter() - t0) * 1e3 / iters

    # 2) serialized round-trip latency (includes the transport RTT)
    lat_ser = np.zeros(20)
    for k in range(len(lat_ser)):
        t0 = time.perf_counter()
        out = bench(*bufs[k % 2], keys[k % 2], tti0s[k % n_blocks])
        jax.block_until_ready(out)
        lat_ser[k] = time.perf_counter() - t0
    rtt_ms = float(np.percentile(lat_ser, 50) * 1e3)

    # 3) paced depth-1 pipeline at the 1 kHz TTI cadence: dispatch block
    # k at tick k, then retrieve block k-1.  A deadline miss is either
    # the host slipping a tick, or the retrieval of the previous block
    # (transport RTT + any unfinished compute) taking longer than one
    # tick — i.e. the pipeline cannot sustain the cadence at depth 1.
    period_s = T / 1000.0
    misses = 0
    prev = None
    t_start = time.perf_counter() + 0.05
    for k in range(n_blocks):
        tick = t_start + k * period_s
        now = time.perf_counter()
        if now < tick:
            time.sleep(tick - now)
        else:
            misses += 1  # host itself slipped the tick
        out = bench(*bufs[k % 2], keys[k % 2], tti0s[k])
        if prev is not None:
            t0 = time.perf_counter()
            jax.block_until_ready(prev)
            if time.perf_counter() - t0 > period_s:
                misses += 1  # block k-1 not retrievable within a tick
        prev = out
    jax.block_until_ready(prev)
    assert int(prev[0]) == T * n_ues, "paced run lost CRCs"

    headroom = T / compute_ms
    per_tti_us = compute_ms * 1000.0 / T
    print(
        f"# paced {n_prb} PRB x {n_ues} UEs, T={T} ({period_s*1e3:.0f} ms "
        f"tick) x {n_blocks} blocks: compute={compute_ms:.2f} ms/block "
        f"({per_tti_us:.0f} us/TTI), serialized rtt latency={rtt_ms:.1f} "
        f"ms, misses={misses}/{n_blocks}, headroom={headroom:.2f}x, "
        f"compile={compile_s:.1f}s "
        f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    print(json.dumps({
        "metric": "waveform_paced_headroom_x",
        "value": round(headroom, 2),
        "unit": "x (T ms tick / device compute per block)",
        "vs_baseline": round(headroom, 2),  # reference paces at exactly 1x
        "n_prb": n_prb, "n_ues": n_ues, "block_ttis": T,
        "blocks": n_blocks, "deadline_misses": misses,
        "compute_ms": round(compute_ms, 2),
        "serialized_rtt_ms": round(rtt_ms, 2),
        "per_tti_us": round(per_tti_us, 1),
        "compile_s": round(compile_s, 1),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
