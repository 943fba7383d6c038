"""Pallas TPU kernel for the max-log-MAP inner loop (experimental fast path).

The XLA-scan implementation (turbodecoder._map_decode) streams gammas from
HBM three times (alpha-halo, beta, alpha+combine) and materializes the per-
window beta array.  This kernel runs one whole MAP window-tile per grid
program with everything resident in VMEM:

  layout: trellis state s (8) on the sublane axis, 128 (cb x window) lanes
          per tile; gammas (T, 4, 128); betas stored in a VMEM scratch.
  passes: backward (beta) then forward (alpha) with the posterior LLR
          combine fused into the forward loop.

The 8-state transition gather is expressed as static sublane selects
(jnp.take on axis 0 of an (8, 128) tile).  Use `use_pallas=True` on
map_decode_pallas callers; correctness is pinned against the XLA path in
tests/test_turbodecoder_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .turbodecoder import max_star, _trellis

LANES = 128


@functools.lru_cache(maxsize=None)
def _tables():
    T = _trellis()
    ns, pz = T["next_state"], T["parity"]
    ps, pu = T["prev_state"], T["prev_u"]
    combo_fwd = (pu * 2 + pz[ps, pu]).astype(np.int32)  # (8, 2)
    combo_bwd = (np.arange(2)[None, :] * 2 + pz).astype(np.int32)  # (8, 2)
    combo_all = (np.arange(2)[:, None] * 2 + pz.T).astype(np.int32)  # (2, 8)
    return dict(ns=ns.astype(np.int32), ps=ps.astype(np.int32),
                combo_fwd=combo_fwd, combo_bwd=combo_bwd,
                combo_all=combo_all, ns_t=ns.T.astype(np.int32))


def _rows(x, idx_list):
    """Static sublane permutation: stack single-row selects (no captured
    constant arrays; Mosaic lowers each row select directly)."""
    return jnp.stack([x[int(i)] for i in idx_list], axis=0)


def _map_kernel(g_ref, a0_ref, b0_ref, llr_ref, beta_scratch):
    t = _tables()
    T = g_ref.shape[0]
    ps, ns = t["ps"], t["ns"]
    cf, cb, ca, nst = t["combo_fwd"], t["combo_bwd"], t["combo_all"], t["ns_t"]

    # ---- backward pass: beta_scratch[t] = beta at node t+1 ----
    def bwd(i, beta):
        tt = T - 1 - i
        g = g_ref[tt]  # (4, 128)
        # cand[s, j] = beta[ns[s, j]] + g[combo_bwd[s, j]]
        c0 = _rows(beta, ns[:, 0]) + _rows(g, cb[:, 0])
        c1 = _rows(beta, ns[:, 1]) + _rows(g, cb[:, 1])
        new = max_star(c0, c1)
        new = new - jnp.max(new, axis=0, keepdims=True)
        beta_scratch[tt] = beta
        return new

    jax.lax.fori_loop(0, T, bwd, b0_ref[:])

    # ---- forward pass with fused posterior combine ----
    def fwd(tt, alpha):
        g = g_ref[tt]
        beta_next = beta_scratch[tt]  # beta at node tt+1 (stored by bwd)
        # posterior: cand[u, s] = alpha[s] + g[combo_all[u, s]] + beta'[ns[s, u]]
        m0 = jnp.max(alpha + _rows(g, ca[0]) + _rows(beta_next, nst[0]), axis=0)
        m1 = jnp.max(alpha + _rows(g, ca[1]) + _rows(beta_next, nst[1]), axis=0)
        llr_ref[tt] = m0 - m1
        # alpha update
        c0 = _rows(alpha, ps[:, 0]) + _rows(g, cf[:, 0])
        c1 = _rows(alpha, ps[:, 1]) + _rows(g, cf[:, 1])
        new = max_star(c0, c1)
        return new - jnp.max(new, axis=0, keepdims=True)

    jax.lax.fori_loop(0, T, fwd, a0_ref[:])


def map_window_tiles(g, a_init, b_init, interpret: bool = False):
    """Run the MAP over window tiles.

    g: (n_tiles, T, 4, 128) branch metrics (combo = u*2+z);
    a_init: (n_tiles, 8, 128) alpha at node 0 (halo pre-scan output);
    b_init: (n_tiles, 8, 128) beta at node T.
    Returns llr (n_tiles, T, 128)."""
    n_tiles, T = g.shape[0], g.shape[1]
    return pl.pallas_call(
        _map_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((None, T, 4, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, T, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, T, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, 8, LANES), jnp.float32)],
        interpret=interpret,
    )(g, a_init, b_init)


def map_decode_pallas(ls_eff, lp, tail_x, tail_z, interpret: bool | None = None):
    """Drop-in for turbodecoder._map_decode using the Pallas kernel.

    Halo pre-scans and tail/edge inits reuse the XLA machinery (they are a
    small fraction of the work); the O(K) MAP itself runs in the kernel.
    interpret=None auto-selects: compiled on TPU, interpreter elsewhere."""
    import jax as _jax

    if interpret is None:
        interpret = _jax.default_backend() != "tpu"
    from . import turbodecoder as td

    T = td._trellis()
    B, K = ls_eff.shape
    W = td._pick_windows(K)
    L = K // W
    H = min(td.HALO, L)
    g = td._gammas(ls_eff, lp)  # (B, K, 4)

    pos = np.arange(W)[:, None] * L
    a_halo_idx = pos + np.arange(-H, 0)[None, :]
    b_halo_idx = pos + np.arange(L, L + H)[None, :]
    g_pad = jnp.pad(g, ((0, 0), (H, H), (0, 0)))
    ga_halo = jnp.take(g_pad, jnp.asarray(a_halo_idx + H).reshape(-1), axis=1).reshape(B, W, H, 4)
    gb_halo = jnp.take(g_pad, jnp.asarray(b_halo_idx + H).reshape(-1), axis=1).reshape(B, W, H, 4)
    g_win = g.reshape(B, W, L, 4)

    ns, pz = T["next_state"], T["parity"]
    ps, pu = T["prev_state"], T["prev_u"]
    combo_fwd = (pu * 2 + pz[ps, pu]).astype(np.int32)
    combo_bwd = (np.arange(2)[None, :] * 2 + pz).astype(np.int32)

    def alpha_step(alpha, g_t):
        cand = alpha[..., ps] + g_t[..., combo_fwd]
        out = max_star(cand[..., 0], cand[..., 1])
        return out - jnp.max(out, axis=-1, keepdims=True), None

    def beta_step(beta, g_t):
        cand = beta[..., ns] + g_t[..., combo_bwd]
        out = max_star(cand[..., 0], cand[..., 1])
        return out - jnp.max(out, axis=-1, keepdims=True), None

    uniform = jnp.zeros((B, W, 8), jnp.float32)
    a_init = jax.lax.scan(alpha_step, uniform, ga_halo.transpose(2, 0, 1, 3))[0]
    exact0 = jnp.full((8,), td.NEG, jnp.float32).at[0].set(0.0)
    a_init = a_init.at[:, 0, :].set(exact0)
    b_init = jax.lax.scan(beta_step, uniform, gb_halo.transpose(2, 0, 1, 3)[::-1])[0]
    beta_tail = 0.5 * jnp.einsum(
        "sj,bj->bs", jnp.asarray(T["tail_signs"]),
        jnp.stack([tail_x[:, 0], tail_z[:, 0], tail_x[:, 1], tail_z[:, 1],
                   tail_x[:, 2], tail_z[:, 2]], axis=-1))
    b_init = b_init.at[:, W - 1, :].set(
        beta_tail - jnp.max(beta_tail, axis=-1, keepdims=True))

    # tile (B*W) lanes into chunks of 128
    n_lanes = B * W
    n_tiles = -(-n_lanes // LANES)
    pad = n_tiles * LANES - n_lanes

    def to_tiles(x, inner):  # x: (B, W, *inner) -> (n_tiles, *inner, 128)
        flat = x.reshape((n_lanes,) + inner)
        flat = jnp.pad(flat, ((0, pad),) + ((0, 0),) * len(inner))
        moved = jnp.moveaxis(flat.reshape((n_tiles, LANES) + inner), 1, -1)
        return moved

    g_t = to_tiles(g_win, (L, 4))  # (n_tiles, L, 4, 128)
    a_t = to_tiles(a_init, (8,))
    b_t = to_tiles(b_init, (8,))
    llr_t = map_window_tiles(g_t, a_t, b_t, interpret=interpret)
    llr = jnp.moveaxis(llr_t, -1, 1).reshape(n_tiles * LANES, L)[:n_lanes]
    return llr.reshape(B, W, L).reshape(B, K)
