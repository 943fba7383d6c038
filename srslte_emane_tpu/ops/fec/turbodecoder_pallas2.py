"""Pallas TPU MAP kernel, v2 — whole half-iteration in one kernel, states
held in registers.

Aimed at the sequential-chain cost that dominates the max-log-MAP on TPU
(reference: `lib/src/phy/fec/turbodecoder_win.h:36-87` — SIMD windows with
40-step halo):

  * the 8 trellis states live in 8 SEPARATE variables, each a fully packed
    (G, 128) tile (G sublanes x 128 lanes of independent (cb x window)
    columns).  State permutations become variable renaming — zero sublane
    shuffles — and every vector op runs at full vreg utilization.  (v1 kept
    states in the sublane dim of an (8, 128) tile, so each per-state row
    select produced a 1/8-occupied vreg and the kernel ran at 1/8 width.)
  * halo warm-up runs INSIDE the kernel; exact edge inits (alpha_0, beta_K
    from tail metrics) are injected after the warm-up via per-column masks,
  * branch metrics built on the fly from systematic/parity rows: the 4
    (u, z) combos are [a, b, -b, -a] with a=(ls+lp)/2, b=(ls-lp)/2,
  * no per-step normalization: f32 path metrics drift far inside f32 range
    (the reference normalizes because its 16-bit SIMD lanes saturate;
    turbodecoder.h:50-66),
  * two trellis steps per loop iteration (radix-2 unroll).

Bit-exactness vs the XLA no-norm MAP is pinned in
tests/test_turbodecoder_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .turbodecoder import _trellis, _pick_windows, HALO, NEG, max_star

LANES = 128
SUBS = 8  # sublane batching: columns per lane handled per op


@functools.lru_cache(maxsize=None)
def _tables():
    T = _trellis()
    ns, pz = T["next_state"], T["parity"]
    ps, pu = T["prev_state"], T["prev_u"]
    combo_fwd = (pu * 2 + pz[ps, pu]).astype(np.int32)  # (8, 2)
    combo_bwd = (np.arange(2)[None, :] * 2 + pz).astype(np.int32)  # (8, 2)
    combo_all = (np.arange(2)[:, None] * 2 + pz.T).astype(np.int32)  # (2, 8)
    return dict(ns=ns.astype(np.int32), ps=ps.astype(np.int32),
                pu=pu.astype(np.int32),
                combo_fwd=combo_fwd, combo_bwd=combo_bwd,
                combo_all=combo_all, ns_t=ns.T.astype(np.int32))


def _g4(ls_row, lp_row):
    """(G,128) PRE-HALVED ls/lp rows -> 4 branch metrics, combo = u*2+z.

    Inputs arrive already scaled by 0.5 (done once outside the kernel;
    exact in fp, so bit-identical to scaling here) — the kernel's branch
    metrics are then plain add/sub."""
    ls_row = ls_row.astype(jnp.float32)
    lp_row = lp_row.astype(jnp.float32)
    a = ls_row + lp_row
    b = ls_row - lp_row
    return [a, b, -b, -a]


def _map_kernel(ls_ref, lp_ref, ab_exact_ref, ab_mask_ref, llr_ref,
                beta_scratch, *, L, H, narrow=False):
    """One tile: ls/lp (H+L+H, G, 128); ab_exact (16, G, 128) = exact
    alpha0 rows 0:8 + exact betaK rows 8:16; ab_mask same split (1.0 where
    the exact init applies to this column).  States are tuples of 8
    (G, 128) arrays throughout."""
    t = _tables()
    ps, ns, pu = t["ps"], t["ns"], t["pu"]
    cf, cb = t["combo_fwd"], t["combo_bwd"]

    def bwd_step(beta, tt):
        g = _g4(ls_ref[tt], lp_ref[tt])
        return tuple(
            max_star(beta[ns[s, 0]] + g[cb[s, 0]],
                     beta[ns[s, 1]] + g[cb[s, 1]])
            for s in range(8))

    def fwd_step(alpha, g):
        return tuple(
            max_star(alpha[ps[s, 0]] + g[cf[s, 0]],
                     alpha[ps[s, 1]] + g[cf[s, 1]])
            for s in range(8))

    zero = jnp.zeros(ls_ref.shape[1:], jnp.float32)
    zeros8 = (zero,) * 8

    # ---- backward: halo warm-up from uniform over [H+L, H+2L) ----
    beta = jax.lax.fori_loop(
        0, H, lambda i, b: bwd_step(b, H + L + (H - 1 - i)), zeros8,
        unroll=H)
    beta = tuple(
        jnp.where(ab_mask_ref[8 + s] > 0, ab_exact_ref[8 + s], beta[s])
        for s in range(8))
    bmax = functools.reduce(jnp.maximum, beta)
    beta = tuple(b - bmax for b in beta)

    # ---- backward over the window, storing beta at node tt+1, radix-2 ----
    sdt = beta_scratch.dtype

    def bwd(i, beta):
        tt = L - 1 - 2 * i
        beta_scratch[tt] = jnp.stack(beta).astype(sdt)
        beta = bwd_step(beta, H + tt)
        beta_scratch[tt - 1] = jnp.stack(beta).astype(sdt)
        beta = bwd_step(beta, H + tt - 1)
        if narrow:
            # bf16 scratch: renormalize every radix-2 pair so the stored
            # magnitudes stay inside bf16's useful resolution (the common
            # offset cancels in the m0 - m1 combine, so this is free of
            # algorithmic effect; the f32 path skips it and drifts)
            bm = functools.reduce(jnp.maximum, beta)
            beta = tuple(b - bm for b in beta)
        return beta

    jax.lax.fori_loop(0, L // 2, bwd, beta, unroll=1)

    # ---- forward: halo warm-up over [0, H) ----
    alpha = jax.lax.fori_loop(
        0, H, lambda i, a: fwd_step(a, _g4(ls_ref[i], lp_ref[i])), zeros8,
        unroll=H)
    alpha = tuple(
        jnp.where(ab_mask_ref[s] > 0, ab_exact_ref[s], alpha[s])
        for s in range(8))
    amax = functools.reduce(jnp.maximum, alpha)
    alpha = tuple(a - amax for a in alpha)

    # ---- forward with fused posterior combine, radix-2 ----
    # t[s][u] = alpha[s] + g[u*2+pz[s,u]] is SHARED between the posterior
    # combine (m_u = max_s t[s][u] + beta_next[ns[s,u]]) and the alpha
    # recursion (alpha'[s'] = max over its two predecessor transitions).
    # Bit-exact: identical terms, identical association order.  Measured
    # neutral on TPU — Mosaic's CSE already merged the duplicate adds —
    # but the sharing is now explicit rather than compiler-dependent.
    # With it, the kernel sits at the VPU issue-rate bound (~85 vector
    # ops/trellis step ~= 128 cycles measured).
    def fwd_emit(alpha, tt):
        g = _g4(ls_ref[H + tt], lp_ref[H + tt])
        tsu = [[alpha[s] + g[cb[s, u]] for u in range(2)] for s in range(8)]
        bn = beta_scratch[tt]
        m0 = functools.reduce(jnp.maximum, (
            tsu[s][0] + bn[ns[s, 0]] for s in range(8)))
        m1 = functools.reduce(jnp.maximum, (
            tsu[s][1] + bn[ns[s, 1]] for s in range(8)))
        llr_ref[tt] = m0 - m1
        return tuple(
            max_star(tsu[ps[s, 0]][pu[s, 0]], tsu[ps[s, 1]][pu[s, 1]])
            for s in range(8))

    def fwd(i, alpha):
        tt = 2 * i
        alpha = fwd_emit(alpha, tt)
        return fwd_emit(alpha, tt + 1)

    jax.lax.fori_loop(0, L // 2, fwd, alpha, unroll=1)


def map_window_tiles(ls_t, lp_t, ab_exact, ab_mask, L, H,
                     interpret: bool = False, narrow: bool = False):
    """ls_t/lp_t: (n_tiles, H+L+H, G, 128); ab_exact/ab_mask:
    (n_tiles, 16, G, 128).  Returns llr (n_tiles, L, G, 128)."""
    n_tiles, Text, G, _ = ls_t.shape
    sdt = jnp.bfloat16 if narrow else jnp.float32
    return pl.pallas_call(
        functools.partial(_map_kernel, L=L, H=H, narrow=narrow),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((None, Text, G, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Text, G, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 16, G, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 16, G, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, L, G, LANES), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, L, G, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((L, 8, G, LANES), sdt)],
        interpret=interpret,
    )(ls_t, lp_t, ab_exact, ab_mask)


def _pick_subs(n_lanes: int, L: int, H: int, narrow: bool = False) -> int:
    """Sublane batching G per tile: widest that fits VMEM.  The grid is
    sequential, so fewer/fatter tiles win; padding up to one tile is cheaper
    than running extra tiles.  bf16 storage (narrow) halves the inputs and
    the beta scratch, so G can double — half the sequential grid steps."""
    nb = 2 if narrow else 4
    best = 1
    for g in (2, 4, 8, 16, 32):
        # VMEM: 2 inputs (L+2H, g, 128) + scratch (L, 8, g, 128) at nb bytes
        #       + llr f32 (L, g, 128) + 2 masks f32 (16, g, 128)
        vmem = 128 * g * (nb * ((L + 2 * H) * 2 + L * 8) + 4 * (L + 32))
        if vmem > 12 * 1024 * 1024:
            break
        if -(-n_lanes // (g * LANES)) * g * LANES \
                < -(-n_lanes // (best * LANES)) * best * LANES + g * LANES:
            best = g
    return best


def map_decode_pallas2(ls_eff, lp, tail_x, tail_z,
                       interpret: bool | None = None, narrow: bool = False):
    """Drop-in for turbodecoder._map_decode: whole half-iteration in-kernel.

    ls_eff/lp: (B, K); tail_x/tail_z: (B, 3).  Returns posterior LLR (B, K).
    narrow: bf16 storage for the LLR inputs and the beta scratch (the
    recursions stay f32 in registers) — the TPU analog of the reference's
    16-bit SIMD mode (`turbodecoder.h:50-66`): half the VMEM per column
    doubles the tile width G, halving the sequential grid depth.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = _trellis()
    B, K = ls_eff.shape
    W = _pick_windows(K)
    # kernel-aware refinement: the measured optimum is the LONGEST window
    # whose tile width still fills a whole vreg (G >= 8) — fewer windows
    # mean less halo work, and G < 8 wastes sublanes.  bf16 storage
    # (narrow) halves VMEM so the same G fits twice the window length.
    for w_c in (2, 4, 8, 16, 32):
        if K % w_c:
            continue
        l_c = K // w_c
        if l_c % 2 == 0 and l_c >= 128 and \
                _pick_subs(B * w_c, l_c, min(HALO, l_c), narrow) >= 8:
            W = w_c
            break
    L = K // W
    H = min(HALO, L)
    if L % 2:  # radix-2 needs even window length; fall back to v1
        from . import turbodecoder_pallas as v1

        return v1.map_decode_pallas(ls_eff, lp, tail_x, tail_z,
                                    interpret=interpret)

    # pre-halve once here (exact: power-of-2 scale) so the kernel's branch
    # metrics are plain add/sub — see _g4
    ls_eff = ls_eff * 0.5
    lp = lp * 0.5

    # per-window extended spans [wL-H, wL+L+H) gathered from zero-padded K
    pos = (np.arange(W)[:, None] * L + np.arange(-H, L + H)[None, :]) + H
    gather = jnp.asarray(pos.reshape(-1), jnp.int32)
    lsx = jnp.take(jnp.pad(ls_eff, ((0, 0), (H, H))), gather, axis=1)
    lpx = jnp.take(jnp.pad(lp, ((0, 0), (H, H))), gather, axis=1)
    lsx = lsx.reshape(B, W, L + 2 * H)
    lpx = lpx.reshape(B, W, L + 2 * H)

    # exact inits: alpha_0 for window 0, beta_K (tail metrics) for window W-1
    exact0 = jnp.broadcast_to(
        jnp.full((8,), NEG, jnp.float32).at[0].set(0.0)[None, :], (B, 8))
    beta_tail = 0.5 * jnp.einsum(
        "sj,bj->bs", jnp.asarray(T["tail_signs"]),
        jnp.stack([tail_x[:, 0], tail_z[:, 0], tail_x[:, 1], tail_z[:, 1],
                   tail_x[:, 2], tail_z[:, 2]], axis=-1))
    ab_exact = jnp.zeros((B, W, 16), jnp.float32)
    ab_exact = ab_exact.at[:, 0, 0:8].set(exact0)
    ab_exact = ab_exact.at[:, W - 1, 8:16].set(beta_tail)
    ab_mask = jnp.zeros((B, W, 16), jnp.float32)
    ab_mask = ab_mask.at[:, 0, 0:8].set(1.0)
    ab_mask = ab_mask.at[:, W - 1, 8:16].set(1.0)

    # tile (B*W) columns into (n_tiles, G, 128)
    n_lanes = B * W
    G = _pick_subs(n_lanes, L, H, narrow)
    per_tile = G * LANES
    n_tiles = -(-n_lanes // per_tile)
    pad = n_tiles * per_tile - n_lanes

    def to_tiles(x, inner):
        flat = x.reshape((n_lanes,) + inner)
        flat = jnp.pad(flat, ((0, pad),) + ((0, 0),) * len(inner))
        flat = flat.reshape((n_tiles, G, LANES) + inner)
        return jnp.moveaxis(flat, (1, 2), (-2, -1))

    idt = jnp.bfloat16 if narrow else jnp.float32
    llr_t = map_window_tiles(
        to_tiles(lsx.astype(idt), (L + 2 * H,)),
        to_tiles(lpx.astype(idt), (L + 2 * H,)),
        to_tiles(ab_exact, (16,)), to_tiles(ab_mask, (16,)),
        L, H, interpret=interpret, narrow=narrow)
    llr = jnp.moveaxis(llr_t, (-2, -1), (1, 2))
    llr = llr.reshape(n_tiles * per_tile, L)[:n_lanes]
    return llr.reshape(B, W, L).reshape(B, K)
