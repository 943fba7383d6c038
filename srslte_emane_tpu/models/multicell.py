"""Waveform-level multi-cell network step: every link at IQ fidelity.

The message-level mode (runtime/) adjudicates links with the SINR model;
this model instead synthesizes every cell's full DL subframe, superposes
them at each UE with per-link complex gains + AWGN, and runs the full UE
receive chain against the serving cell — co-channel interference, CRS
collisions, and capture effects emerge from the waveform itself.

Everything is batched: cells build their subframes in one pass (cell axis),
UEs decode in one pass (UE axis).  One jittable step per static
(cells x grants) configuration — the "thousands of subframes sharded across
the pod" shape of BASELINE.json config #5.
"""

from __future__ import annotations

import dataclasses
import typing

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import channel as channel_ops
from ..ops import cplx, ofdm
from ..phch import grid as grid_mod, pdsch, sch
from . import enb_dl, ue_dl


@dataclasses.dataclass(frozen=True)
class MulticellConfig:
    cells: tuple  # tuple of enb_dl.DlSubframeConfig
    # ue i serves cell serving[i] and holds grant index grant_of[i] there
    serving: tuple = (0,)
    grant_of: tuple = (0,)
    snr_db: float = 30.0


def step(cfg: MulticellConfig, payloads, gains, key):
    """One TTI at waveform level.

    payloads: per cell -> list of (B, tbs) arrays matching its grants;
    gains: (n_ue, n_cells, 2) cf link gains; key: PRNG for AWGN.
    Returns per-UE (ok (B,), payload bits) from the full receive chain."""
    txs = []
    for ci, cell_cfg in enumerate(cfg.cells):
        txs.append(enb_dl.build_subframe(cell_cfg, payloads[ci]))
    tx = jnp.stack(txs, axis=1)  # (B, n_cells, T, 2)
    results = []
    for ui, serving in enumerate(cfg.serving):
        g = jnp.asarray(gains[ui])  # (n_cells, 2)
        rx = jnp.sum(cplx.mul(g[None, :, None, :], tx), axis=1)  # (B, T, 2)
        rx = channel_ops.awgn(key, rx, cfg.snr_db)
        cell_cfg = cfg.cells[serving]
        res, _ = ue_dl.decode_subframe(rx, cell_cfg)
        gi = cfg.grant_of[ui]
        results.append((res.crc_ok[gi], res.payloads[gi], res.snr_db))
    return results
