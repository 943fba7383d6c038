"""TM3 2x2 MIMO inside the device-resident waveform block.

Two codewords per (TTI, UE) ride large-delay-CDD spatial multiplexing
(36.211 §6.3.4.2.2) through a fixed per-UE 2x2 channel: per-port CRS
channel estimation, CDD folded into the effective channel, closed-form
2x2 ZF, two turbo decodes, spatially bundled PUCCH ACK.

Reference parity: lib/src/phy/mimo/precoding.c (CDD + ZF),
srsenb 150 Mb/s TM3/TM4 headline (debian/man/srsenb.txt:17).

Scenarios run in subprocesses (cumulative-compile isolation; see
test_waveblock.py).
"""

import os
import subprocess
import sys

import numpy as np


def _isolated(name, timeout=1700):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, __file__, name],
                       capture_output=True, text=True, env=env,
                       timeout=timeout)
    assert r.returncode == 0, \
        f"scenario {name} failed:\n{r.stdout[-2000:]}\n{r.stderr[-3000:]}"


def test_tm3_block_dual_codeword_roundtrip():
    """Well-conditioned 2x2: BOTH codewords of every (TTI, UE) decode
    bit-exact — 2x the SISO payload through the same allocation — and
    the bundled ACK is detected."""
    _isolated("roundtrip")


def test_tm3_block_rank_deficient_channel_fails_and_nacks():
    """Control: a ~rank-1 channel (60 dB condition number) cannot carry
    two spatial layers — codeword CRCs fail and the bundled ACK goes
    negative (the rank-adaptation signal a scheduler would act on)."""
    _isolated("rank1")


# ---------------------------------------------------------------------------

def _cfg(mimo_cond_db=0.0, n_prb=15, n_ues=2, T=6, dl_mcs=10):
    from srslte_emane_tpu.phch import grid as grid_mod, pdcch
    from srslte_emane_tpu.runtime import waveblock

    cell = grid_mod.CellConfig(n_prb=n_prb, cell_id=1, cfi=2, n_ports=2)
    n_cce = pdcch.n_cce(cell)
    c0, c1 = waveblock.centre_prbs(n_prb)
    dl_starts, dl_w = waveblock._pack_segments(
        n_prb, n_ues, [(0, c0), (c1, n_prb)])
    return waveblock.BlockConfig(
        cell=cell, rntis=tuple(70 + i for i in range(n_ues)),
        dl_rb_start=dl_starts, dl_l_crbs=dl_w, dl_mcs=dl_mcs,
        ul_rb_start=tuple(1 + 4 * i for i in range(n_ues)), ul_l_prb=4,
        ul_mcs=10,
        ack_res=tuple(n_cce + i for i in range(n_ues)),
        snr_db=tuple(30.0 - i for i in range(n_ues)), T=T,
        tm3=True, mimo_cond_db=mimo_cond_db)


def _run(mimo_cond_db):
    import jax
    import jax.numpy as jnp

    from srslte_emane_tpu.runtime import waveblock

    cfg = _cfg(mimo_cond_db=mimo_cond_db)
    step = waveblock.make_block_step(cfg, sfn0=8)
    rng = np.random.default_rng(0)
    dl = rng.integers(0, 2, (cfg.T, cfg.n_ues, 2, cfg.dl_tbs),
                      dtype=np.int8)
    ul = rng.integers(0, 2, (cfg.T, cfg.n_ues, cfg.ul_tbs), dtype=np.int8)
    out = step(jnp.asarray(dl), jnp.asarray(ul), jax.random.PRNGKey(1),
               jnp.asarray(40, jnp.int32))
    return cfg, dl, {k: np.asarray(v) for k, v in out.items()}


def _roundtrip():
    cfg, dl, out = _run(0.0)
    assert out["dl_ok_cw"].all(), out["dl_ok_cw"]
    got = out["dl_out"].reshape(cfg.T, cfg.n_ues, 2, -1)
    assert (got == dl).all()
    assert out["ul_ok"].all()  # SISO UL unchanged alongside
    assert (out["ack_energy"] > 0.25).all()
    assert (out["ack_val"] > 0).all()


def _rank1():
    _, _, out = _run(60.0)
    assert not out["dl_ok_cw"].any()
    # NACK rides the PUCCH: energy present, correlation negative
    assert (out["ack_energy"] > 0.25).all()
    assert (out["ack_val"] < 0).all()


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    jax.config.update("jax_platforms", "cpu")
    {"roundtrip": _roundtrip, "rank1": _rank1}[sys.argv[1]]()
