"""TPU benchmark of the DYNAMIC device-resident waveform block.

Measures runtime/waveblock_dyn.py — R rounds x 8 TTIs x n_ues of the
FULL dynamic PHY loop as ONE compiled program: per-TTI PDCCH DCI
(conv-coded, CRC16^RNTI, true search-space CCEs), UE-side blind decode,
PDSCH/PUSCH with live 8-process IR-HARQ soft buffers, PUCCH HARQ-ACK +
PHICH over the air.  This is the semantic superset of
bench_waveform_tpu.py's SPS steady state; the reference's sf_worker
pipeline produces 1000 TTIs/s (real time) on an x86 host.

Prints one JSON line:
  {"metric": "waveform_dyn_block_ttis_per_sec", "value": ..., ...}

Usage: python scripts/bench_waveblock_dyn.py [n_ues] [R] [iters] [runs]
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

    from srslte_emane_tpu.phch import grid as grid_mod
    from srslte_emane_tpu.runtime import waveblock_dyn as wbd

    n_ues = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    n_runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    cell = grid_mod.CellConfig(n_prb=100, cell_id=1, cfi=2)
    rntis = wbd.feasible_rntis(cell, n_ues)
    w = {8: 11, 16: 5}.get(n_ues, 94 // n_ues)
    wu = {8: 10, 16: 5}.get(n_ues, 80 // n_ues)
    cfg = wbd.DynBlockConfig(
        cell=cell, rntis=rntis, dl_l_crbs=w,
        dl_mcs=25,  # 64QAM steady-state link-adaptation point
        ul_l_prb=wu, ul_mcs=20,
        snr_db=(30.0,) * n_ues, R=R,
        use_pallas=jax.default_backend() == "tpu", llr_bits=16)
    rb_dl, rb_ul = wbd.make_schedule(cfg, seed=3)
    bench = wbd.make_bench_step(cfg)

    rng = np.random.default_rng(0)
    T = cfg.T
    dl_q = jax.device_put(rng.integers(
        0, 2, (T, n_ues, cfg.dl_tbs), dtype=np.int8))
    ul_q = jax.device_put(rng.integers(
        0, 2, (T, n_ues, cfg.ul_tbs), dtype=np.int8))
    rb_dl = jax.device_put(rb_dl)
    rb_ul = jax.device_put(rb_ul)
    key = jax.random.PRNGKey(0)
    tti0 = jnp.asarray(0, jnp.int32)

    t0 = time.time()
    out = bench(dl_q, ul_q, rb_dl, rb_ul, key, tti0)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    d_ok, u_ok, a_ok, d_rtx, u_rtx, miss = (int(x) for x in out)
    assert d_ok == T * n_ues, f"DL CRCs failed: {d_ok}/{T*n_ues}"
    assert u_ok == T * n_ues, f"UL CRCs failed: {u_ok}/{T*n_ues}"
    assert a_ok == T * n_ues, f"ACKs missing: {a_ok}/{T*n_ues}"
    assert miss == 0, f"DCI misses at 30 dB: {miss}"

    rates = []
    for _ in range(n_runs):
        t0 = time.time()
        for _ in range(iters):
            out = bench(dl_q, ul_q, rb_dl, rb_ul, key, tti0)
        jax.block_until_ready(out)
        rates.append(T * iters / (time.time() - t0))
    ttis_s = float(np.median(rates))
    spread = 100.0 * (max(rates) - min(rates)) / ttis_s
    dl_mbps = ttis_s * n_ues * cfg.dl_tbs / 1e6
    ul_mbps = ttis_s * n_ues * cfg.ul_tbs / 1e6
    print(
        f"# dyn-block 100 PRB x {n_ues} UEs, T={T}: compile={compile_s:.1f}s "
        f"{ttis_s:.0f} TTIs/s (spread {spread:.1f}%) = "
        f"{ttis_s/1000.0:.1f}x real time; cell DL {dl_mbps:.0f} Mb/s + "
        f"UL {ul_mbps:.0f} Mb/s; per-TTI DCI x{2*n_ues} blind-decoded, "
        f"8-process IR-HARQ live; device={jax.devices()[0].device_kind}",
        file=sys.stderr)
    print(json.dumps({
        "metric": "waveform_dyn_block_ttis_per_sec",
        "value": round(ttis_s, 1),
        "unit": "TTIs/s",
        "vs_baseline": round(ttis_s / 1000.0, 3),
        "n_prb": 100, "n_ues": n_ues, "block_ttis": T,
        "dl_mbps": round(dl_mbps, 1), "ul_mbps": round(ul_mbps, 1),
        "median_of": n_runs, "spread_pct": round(spread, 2),
        "compile_s": round(compile_s, 1),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
