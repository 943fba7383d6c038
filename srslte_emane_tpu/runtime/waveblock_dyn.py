"""Device-resident DYNAMIC waveform block: per-TTI PDCCH DCI + 8-process
IR-HARQ inside one compiled XLA program.

Where waveblock.py models the SPS steady state (fixed periodic grants, no
per-TTI control, losses recovering via RLC AM), this module is the
TPU-native analogue of the reference's fully dynamic per-TTI loop
(`srsenb/src/phy/sf_worker.cc:354` work_imp: per-subframe
get_dl_sched/get_ul_sched grants, DCI on PDCCH, 8-process HARQ with IR
soft-combining — `srsenb/src/stack/mac/scheduler_harq.cc`,
`lib/src/phy/fec/softbuffer.c` + `phch/sch.c:389-414`):

  per TTI, ON DEVICE:
    eNB tx: pack DCI-1A (DL) + DCI-0 (UL) as traced bit tensors -> PDCCH
        (conv code + CRC16^RNTI at true 36.213 search-space CCEs) ->
        PDSCH at per-TTI hopped rb_start with NDI/RV from live HARQ
        state -> PHICH (previous round's UL CRCs, §9.1.2 mapping) ->
        OFDM modulate.
    UE rx: blind-decode its search-space candidates from the waveform
        (batched hypothesis Viterbi + CRC16^RNTI adjudication), follow
        ONLY what was decoded (RIV -> rb_start, NDI -> new-data detect,
        RV -> combine position), PDSCH decode with persistent
        per-(ue, pid) soft buffers (NDI toggle resets them,
        srsue dl_harq.cc), decode PHICH from the waveform.
    UE tx: HARQ-ACK on PUCCH format 1a at n1 = nCCE(DL DCI) + N1 (DTX
        when the DCI was missed), PUSCH with synchronous non-adaptive UL
        HARQ (PHICH-NACK-driven retransmissions, srsue ul_harq.cc).
    eNB rx: PUSCH decode with per-(ue, pid) soft buffers + RV cycling,
        PUCCH ACK matched filter with DTX detection -> next round's
        retransmission/NDI/drop decisions (max_tx cap).

The time axis is a lax.scan over HARQ ROUNDS of 8 TTIs: a round's 8 TTIs
are 8 independent HARQ processes and batch perfectly onto the MXU; the
scan carry is exactly the protocol's persistent state (soft buffers, NDI
toggles, retransmission counters, payload-queue pointers).

Modeling simplifications (everything else is live protocol):
  - the 4 ms HARQ-ACK/PHICH air delay is folded into the TTI (feedback
    for TTI t rides t's own UL; the retransmission lands at t+8 — the
    true 8-process cadence of the reference's TX_DELAY=4 pipeline);
  - grant WIDTHS and MCS are static per block (XLA shapes); rb_start
    hops per TTI and all other control fields are live;
  - one aggregation level per block (the UE still blind-decodes its
    candidate set and can MISS: a missed DL DCI becomes PUCCH DTX, a
    missed UL DCI leaves the grant unused);
  - PHICH (group, seq) uses n_dmrs = UE index (an eNB cyclic-shift
    assignment freedom); colliding resources superpose exactly as the
    spec says they would.
"""

from __future__ import annotations

import types
import typing

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cplx, dft, modem, ofdm, scrambling, sequence
from ..ops.fec import convcoder, crc as crc_mod, viterbi
from ..phch import chest, dci as dci_mod, grid as grid_mod
from ..phch import pdcch as pdcch_mod, phich as phich_mod
from ..phch import pucch as pucch_mod, pusch as pusch_mod, ra, sch
from . import waveblock

RV_SEQ = np.array([0, 2, 3, 1], np.int32)  # scheduler_harq.cc RV cycle
N_PID = 8


class DynBlockConfig(typing.NamedTuple):
    """Static shape parameters of the dynamic block (one program each)."""

    cell: grid_mod.CellConfig
    rntis: tuple
    dl_l_crbs: int
    dl_mcs: int
    ul_l_prb: int
    ul_mcs: int
    snr_db: tuple  # per-UE link SNR
    R: int  # HARQ rounds (T = 8*R TTIs)
    l_aggr: int = 1
    max_tx: int = 4  # transmissions before drop (mac max-harq-tx)
    ack_thresh: float = 0.25  # PUCCH energy DTX threshold
    use_pallas: bool = False
    llr_bits: int = 32
    combine: bool = True  # False = chase combining (retx-only control)

    @property
    def n_ues(self) -> int:
        return len(self.rntis)

    @property
    def T(self) -> int:
        return N_PID * self.R

    @property
    def dl_tbs(self) -> int:
        return ra.dl_tbs(self.dl_mcs, self.dl_l_crbs)

    @property
    def ul_tbs(self) -> int:
        return ra.ul_tbs(self.ul_mcs, self.ul_l_prb)


# ---------------------------------------------------------------------------
# host-side table construction
# ---------------------------------------------------------------------------

def _alloc_cces(cfg: DynBlockConfig) -> tuple:
    """(cce_dl (10, n), cce_ul (10, n), cand (10, n, n_cand)) int32:
    per-sf collision-free CCE choices for both grants from each UE's TRUE
    36.213 search space at the block's aggregation level, plus the
    candidate lists the UE blind-decodes."""
    cell, l = cfg.cell, cfg.l_aggr
    cands_per = {}
    for sf in range(10):
        for rnti in cfg.rntis:
            cs = [s for (ll, s) in pdcch_mod.candidates(cell, rnti, sf)
                  if ll == l]
            assert cs, (rnti, sf, l, "no candidates at this aggregation")
            cands_per[(sf, rnti)] = cs
    n_cand = max(len(v) for v in cands_per.values())
    cce_dl = np.zeros((10, cfg.n_ues), np.int32)
    cce_ul = np.zeros((10, cfg.n_ues), np.int32)
    cand = np.zeros((10, cfg.n_ues, n_cand), np.int32)
    for sf in range(10):
        for u, rnti in enumerate(cfg.rntis):
            cs = cands_per[(sf, rnti)]
            cand[sf, u] = (cs * n_cand)[:n_cand]  # pad by cycling
        # backtracking assignment (scheduler_grid.cc alloc_dci role):
        # 2 disjoint candidates per UE, most-constrained UE first
        order = sorted(range(cfg.n_ues),
                       key=lambda u: len(cands_per[(sf, cfg.rntis[u])]))
        choice = {}
        budget = [20000]  # node cap: cap-exceeded counts as infeasible

        def place(i, used):
            budget[0] -= 1
            if budget[0] <= 0:
                return False
            if i == len(order):
                return True
            u = order[i]
            cs = cands_per[(sf, cfg.rntis[u])]
            for a in range(len(cs)):
                ca = set(range(cs[a], cs[a] + l))
                if ca & used:
                    continue
                for b in range(len(cs)):
                    if b == a:
                        continue
                    cb = set(range(cs[b], cs[b] + l))
                    if cb & (used | ca):
                        continue
                    choice[u] = (cs[a], cs[b])
                    if place(i + 1, used | ca | cb):
                        return True
            choice.pop(u, None)
            return False

        assert place(0, set()), (
            f"sf {sf}: cannot place 2 grants x {cfg.n_ues} UEs at L={l}")
        for u in range(cfg.n_ues):
            cce_dl[sf, u], cce_ul[sf, u] = choice[u]
    return cce_dl, cce_ul, cand


def feasible_rntis(cell: grid_mod.CellConfig, n: int, l_aggr: int = 1,
                   start: int = 64) -> tuple:
    """First RNTI set whose 36.213 Y_k candidate positions admit 2
    disjoint grants per UE in EVERY subframe (the real-eNB alternative is
    deferring colliding UEs a TTI; a static block needs an all-sf-feasible
    set, which is the eNB's RNTI-assignment freedom)."""
    picked = []
    rnti = start
    while len(picked) < n:
        assert rnti < start + 4096, "no feasible RNTI set found"
        trial = picked + [rnti]
        shim = types.SimpleNamespace(cell=cell, rntis=tuple(trial),
                                     l_aggr=l_aggr, n_ues=len(trial))
        try:
            _alloc_cces(shim)
            picked = trial
        except AssertionError:
            pass
        rnti += 1
    return tuple(picked)


def _chest_taps(cell: grid_mod.CellConfig):
    """Sparse 2-tap frequency-interp tables: h(sym, k) =
    sum_s tmat[sym, s] * sum_j fw[s, k, j] * h_ls[s, fidx[s, k, j]] —
    exactly chest.estimate's linear-interp matrices, factored so
    ARBITRARY (traced) RE positions can be estimated without ever
    materializing a full-grid CE."""
    ks = grid_mod.crs_k(cell.cell_id, cell.n_prb, 0, cell.cp)
    syms = grid_mod.pilot_syms(0, cell.cp)
    npil = 2 * cell.n_prb
    fidx = np.zeros((len(syms), cell.nre, 2), np.int32)
    fw = np.zeros((len(syms), cell.nre, 2), np.float32)
    for i in range(len(syms)):
        f0 = int(ks[i][0])
        pk = f0 + 6 * np.arange(npil)
        for k in range(cell.nre):
            j = np.clip((k - f0) / 6.0, 0, npil - 1)
            j0 = int(np.clip(np.floor(j), 0, npil - 2))
            t = (k - pk[j0]) / 6.0
            fidx[i, k] = (j0, j0 + 1)
            fw[i, k] = (1.0 - t, t)
    tmat = chest._time_interp_matrix(tuple(syms), cell.n_sym)
    pidx = (np.asarray(syms)[:, None] * cell.nre + ks).astype(np.int32)
    return fidx, fw, tmat.astype(np.float32), pidx


def _dl_window_taps(cfg: DynBlockConfig, base_idx: np.ndarray):
    """Static within-window chest taps for the PDSCH REs.

    The traced rb_start only SHIFTS which pilots matter: with the pilot
    axis padded by one replicated pilot on each side, the window
    h_pad[2*rb : 2*rb + W] (W = 12*w//6 + 2) covers every tap of every
    RE in the allocation, and the within-window tap index of RE column
    kappa = k - 12*rb is STATIC: jl = floor((kappa - f0_s)/6) + 1.  The
    45 ms/round per-row pilot gather becomes one tiny contiguous window
    gather + static-index takes (edge half-PRBs get constant instead of
    linear extrapolation from the replicated pad pilot — the only
    difference vs chest.estimate's matrices)."""
    cell = cfg.cell
    ks = grid_mod.crs_k(cell.cell_id, cell.n_prb, 0, cell.cp)
    syms = grid_mod.pilot_syms(0, cell.cp)
    tmat = chest._time_interp_matrix(tuple(syms), cell.n_sym)
    K = 12 * cfg.dl_l_crbs
    W = 2 * cfg.dl_l_crbs + 2
    S_pil = len(syms)
    re_col = (base_idx % cell.nre).astype(np.int64)
    re_sym = (base_idx // cell.nre).astype(np.int64)
    assert re_col.max() < K
    tap_idx = np.zeros((S_pil, len(base_idx), 2), np.int32)
    tap_w = np.zeros((S_pil, len(base_idx), 2), np.float32)
    for i in range(S_pil):
        f0 = int(ks[i][0])
        jl = np.floor((re_col - f0) / 6.0).astype(np.int64)
        t = (re_col - f0 - 6.0 * jl) / 6.0
        tap_idx[i, :, 0] = jl + 1  # +1: padded pilot axis
        tap_idx[i, :, 1] = jl + 2
        tap_w[i, :, 0] = 1.0 - t
        tap_w[i, :, 1] = t
    assert tap_idx.min() >= 0 and tap_idx.max() < W
    return tap_idx, tap_w, tmat[re_sym].astype(np.float32), W


def _cand_taps(cfg: DynBlockConfig, cand_re: np.ndarray):
    """Fully-static flattened chest taps for the PDCCH candidate REs
    (positions are host-known per (sf, ue, candidate)): 2*S_pil taps per
    RE into the flattened (S_pil*P) LS-pilot axis, with the time-interp
    weight folded in."""
    cell = cfg.cell
    ks = grid_mod.crs_k(cell.cell_id, cell.n_prb, 0, cell.cp)
    syms = grid_mod.pilot_syms(0, cell.cp)
    tmat = chest._time_interp_matrix(tuple(syms), cell.n_sym)
    S_pil = len(syms)
    P = 2 * cell.n_prb
    sh = cand_re.shape  # (10, n, npos)
    k = cand_re % cell.nre
    sym = cand_re // cell.nre
    idx = np.zeros(sh + (2 * S_pil,), np.int32)
    w = np.zeros(sh + (2 * S_pil,), np.float32)
    for i in range(S_pil):
        f0 = int(ks[i][0])
        j0 = np.clip(np.floor((k - f0) / 6.0), 0, P - 2).astype(np.int64)
        t = (k - (f0 + 6.0 * j0)) / 6.0
        tw = tmat[sym, i]
        idx[..., 2 * i] = i * P + j0
        idx[..., 2 * i + 1] = i * P + j0 + 1
        w[..., 2 * i] = tw * (1.0 - t)
        w[..., 2 * i + 1] = tw * t
    return idx, w


def _dl_base_idx(cfg: DynBlockConfig) -> np.ndarray:
    """(n_re,) PDSCH RE indices for a width-w alloc at rb_start=0, proven
    subframe-invariant AND shift-covariant (idx(rb) = idx(0) + 12*rb):
    the within-PRB CRS pattern repeats every PRB and the centre 6 PRBs
    (PSS/SSS/PBCH) are excluded from the schedulable region."""
    cell, w = cfg.cell, cfg.dl_l_crbs
    base = np.asarray(grid_mod.pdsch_re_indices(
        cell, 1, ra.type2_to_prb_mask(0, w, cell.n_prb)), np.int64)
    c0, c1 = waveblock.centre_prbs(cell.n_prb)
    for sf in (0, 1, 5):
        for rb in (0, max(0, c0 - w), c1, cell.n_prb - w):
            if c0 - w < rb < c1 or rb < 0:
                continue
            chk = grid_mod.pdsch_re_indices(
                cell, sf, ra.type2_to_prb_mask(rb, w, cell.n_prb))
            assert np.array_equal(np.asarray(chk, np.int64),
                                  base + 12 * rb), (
                sf, rb, "PDSCH RE table is not shift-covariant")
    return base.astype(np.int32)


def _pucch_region(cell: grid_mod.CellConfig) -> int:
    """Outer PRBs consumed by the dynamic-ACK region [0, nCCE)."""
    m = 0
    for res in range(pdcch_mod.n_cce(cell)):
        for ns in (0, 1):
            p = pucch_mod.pucch_prb(res, ns, cell.n_prb)
            m = max(m, min(p, cell.n_prb - 1 - p) + 1)
    return m


def _consts(cfg: DynBlockConfig) -> dict:
    cell = cfg.cell
    n = cfg.n_ues
    cce_dl, cce_ul, cand = _alloc_cces(cfg)
    fidx, fw, tmat, pidx = _chest_taps(cell)
    ncce = pdcch_mod.n_cce(cell)
    c_all10 = np.stack([
        sequence.gold_sequence_host(
            scrambling.pdcch_cinit(sf, cell.cell_id), 72 * ncce)
        for sf in range(10)]).astype(np.int8)
    cce_re = pdcch_mod.cce_re_indices(cell)  # (ncce, 36)
    l = cfg.l_aggr
    cand_re = np.zeros((10, n, cand.shape[2], 36 * l), np.int32)
    for sf in range(10):
        for u in range(n):
            for ci in range(cand.shape[2]):
                s = cand[sf, u, ci]
                cand_re[sf, u, ci] = cce_re[s : s + l].reshape(-1)
    # PUCCH format-1 tables for the whole dynamic ACK region [0, ncce)
    p_pos = np.zeros((ncce, 2, 7, 12), np.int32)
    p_vals = np.zeros((10, ncce, 2, 7, 12), np.complex64)
    for res in range(ncce):
        for sf in range(10):
            p_vals[sf, res] = pucch_mod._f1_waveform(cell.cell_id, sf, res)
        for s in range(2):
            prb = pucch_mod.pucch_prb(res, s, cell.n_prb)
            ks = 12 * prb + np.arange(12)
            for li in range(7):
                p_pos[res, s, li] = (7 * s + li) * cell.nre + ks
    dmask = np.zeros(7, np.float32)
    for li in pucch_mod.F1_DATA_SYMS:
        dmask[li] = 1.0
    ngrp = phich_mod.n_groups(cell.n_prb)
    ph_re = phich_mod.re_indices(cell)[:ngrp]  # (G, 12)
    ph_sm = np.stack([phich_mod._spread_matrix(cell.cell_id, sf)
                      for sf in range(10)])  # (10, 8, 12, 2)
    ul_data0, ul_dmrs0 = pusch_mod.re_indices(cell.n_prb, 0, cfg.ul_l_prb)
    base10 = waveblock._base_grids(
        types.SimpleNamespace(cell=cell, tm3=False), 0)
    base_idx = _dl_base_idx(cfg)
    dl_tap_idx, dl_tap_w, dl_tw, dl_W = _dl_window_taps(cfg, base_idx)
    # window-relative static RE tables: every per-(t,u) RX gather over
    # the full grid becomes one contiguous frequency-window
    # dynamic_slice + a static-index take (the flat-grid gather from a
    # (T8, n, S)-broadcast was the profiler's top cost at 100 PRB).
    # Shift-covariance (idx(rb) = idx(0) + 12 rb, asserted above for DL;
    # DMRS/data occupy whole PRBs for UL) makes the within-window
    # pattern rb-independent.
    wd_sc = 12 * cfg.dl_l_crbs
    assert (base_idx % cell.nre < wd_sc).all()
    dl_win_idx = (base_idx // cell.nre) * wd_sc + base_idx % cell.nre
    wu_sc = 12 * cfg.ul_l_prb
    assert (ul_data0 % cell.nre < wu_sc).all()
    assert (ul_dmrs0 % cell.nre < wu_sc).all()
    ul_d_win = ((ul_data0 // cell.nre) * wu_sc
                + ul_data0 % cell.nre).reshape(-1)
    ul_m_win = ((ul_dmrs0 // cell.nre) * wu_sc
                + ul_dmrs0 % cell.nre).reshape(-1)
    ct_idx, ct_w = _cand_taps(
        cfg, cand_re.reshape(10, n, -1))
    return dict(
        rntis=np.asarray(cfg.rntis, np.int64),
        amp=10.0 ** (-np.asarray(cfg.snr_db, np.float32) / 20.0),
        base10=np.asarray(base10),
        base_idx=base_idx,
        dl_tap_idx=dl_tap_idx, dl_tap_w=dl_tap_w, dl_tw=dl_tw,
        dl_W=np.int32(dl_W),
        ct_idx=ct_idx, ct_w=ct_w,
        dl_win_idx=dl_win_idx.astype(np.int32),
        ul_d_win=ul_d_win.astype(np.int32),
        ul_m_win=ul_m_win.astype(np.int32),
        cce_dl=cce_dl, cce_ul=cce_ul, cand=cand, cand_re=cand_re,
        c_all10=c_all10,
        fidx=fidx, fw=fw, tmat=tmat, pidx=pidx,
        ch_vals10=np.asarray(cplx.from_numpy(
            chest._crs_values10(cell.cell_id, cell.n_prb, 0, cell.cp))),
        p_pos=p_pos, p_vals=np.asarray(cplx.from_numpy(p_vals)),
        p_dmask=dmask,
        ph_re=ph_re.astype(np.int32), ph_sm=ph_sm,
        ul_data0=ul_data0.astype(np.int32),
        ul_dmrs0=ul_dmrs0.astype(np.int32),
        ul_dmrs10=np.asarray(cplx.from_numpy(
            pusch_mod._dmrs10(cell.cell_id, cfg.ul_l_prb))),
    )


def make_schedule(cfg: DynBlockConfig, seed: int = 0):
    """(rb_dl (R, 8, n), rb_ul (R, 8, n)) int32: per-TTI hopped, per-TTI
    disjoint contiguous allocations — the get_dl_sched/get_ul_sched
    choice, precomputed for the block (the MAC's speculation over T)."""
    cell, n = cfg.cell, cfg.n_ues
    rng = np.random.default_rng(seed)
    c0, c1 = waveblock.centre_prbs(cell.n_prb)
    w = cfg.dl_l_crbs
    # width-aligned slots inside the two centre-avoiding segments: a
    # random subset of these per TTI is disjoint by construction
    slots = []
    for lo_s, hi_s in ((0, c0), (c1, cell.n_prb)):
        slots += [lo_s + i * w for i in range((hi_s - lo_s) // w)]
    assert len(slots) >= n, (
        f"{n} UEs x {w} PRB do not fit the centre-avoiding segments")
    rb_dl = np.zeros((cfg.R, N_PID, n), np.int32)
    for r in range(cfg.R):
        for t in range(N_PID):
            rb_dl[r, t] = rng.choice(slots, size=n, replace=False)
    lo = _pucch_region(cell)
    wu = cfg.ul_l_prb
    hi = cell.n_prb - lo
    assert lo + n * wu <= hi, "UL allocations do not fit above PUCCH region"
    rb_ul = np.zeros((cfg.R, N_PID, n), np.int32)
    for r in range(cfg.R):
        for t in range(N_PID):
            off = int(rng.integers(0, hi - lo - n * wu + 1))
            for j, u in enumerate(rng.permutation(n)):
                rb_ul[r, t, u] = lo + off + j * wu
    return rb_dl, rb_ul


# ---------------------------------------------------------------------------
# traced helpers
# ---------------------------------------------------------------------------

def _bits_of(v, width: int):
    """Traced int (...,) -> (..., width) MSB-first bits."""
    sh = jnp.arange(width - 1, -1, -1, dtype=jnp.int32)
    return ((jnp.asarray(v, jnp.int32)[..., None] >> sh) & 1).astype(jnp.int8)


def _int_of(bits):
    """(..., width) bits -> traced int (...,)."""
    sh = jnp.arange(bits.shape[-1] - 1, -1, -1, dtype=jnp.int32)
    return (bits.astype(jnp.int32) << sh).sum(-1)


def _riv(rb, w: int, n_prb: int):
    if w - 1 <= n_prb // 2:
        return n_prb * (w - 1) + jnp.asarray(rb, jnp.int32)
    return n_prb * (n_prb - w + 1) + (n_prb - 1 - jnp.asarray(rb, jnp.int32))


def _unriv(riv, w: int, n_prb: int):
    if w - 1 <= n_prb // 2:
        rb = riv - n_prb * (w - 1)
    else:
        rb = n_prb - 1 - (riv - n_prb * (n_prb - w + 1))
    return jnp.clip(rb, 0, n_prb - w)


def _pack_dci1a(cfg: DynBlockConfig, rb, pid, ndi, rv):
    """Traced DCI format-1A bits (dci.pack_dl layout)."""
    n_prb = cfg.cell.n_prb
    nlen = dci_mod.format0_1a_len(n_prb)
    rl = dci_mod.riv_len(n_prb)
    parts = [
        jnp.ones(rb.shape + (1,), jnp.int8),   # flag = 1A
        jnp.zeros(rb.shape + (1,), jnp.int8),  # localized
        _bits_of(_riv(rb, cfg.dl_l_crbs, n_prb), rl),
        _bits_of(jnp.full(rb.shape, cfg.dl_mcs, jnp.int32), 5),
        _bits_of(pid, 3),
        _bits_of(ndi, 1),
        _bits_of(rv, 2),
        jnp.zeros(rb.shape + (2,), jnp.int8),  # tpc
    ]
    out = jnp.concatenate(parts, axis=-1)
    return jnp.concatenate(
        [out, jnp.zeros(rb.shape + (nlen - out.shape[-1],), jnp.int8)],
        axis=-1)


def _pack_dci0(cfg: DynBlockConfig, rb, ndi):
    """Traced DCI format-0 bits (dci.pack_ul layout)."""
    n_prb = cfg.cell.n_prb
    nlen = dci_mod.format0_1a_len(n_prb)
    rl = dci_mod.riv_len(n_prb)
    parts = [
        jnp.zeros(rb.shape + (2,), jnp.int8),  # flag = 0, hopping = 0
        _bits_of(_riv(rb, cfg.ul_l_prb, n_prb), rl),
        _bits_of(jnp.full(rb.shape, cfg.ul_mcs, jnp.int32), 5),
        _bits_of(ndi, 1),
        jnp.zeros(rb.shape + (6,), jnp.int8),  # tpc(2)+dmrs(3)+cqi(1)
    ]
    out = jnp.concatenate(parts, axis=-1)
    return jnp.concatenate(
        [out, jnp.zeros(rb.shape + (nlen - out.shape[-1],), jnp.int8)],
        axis=-1)


def _scatter_rows(grids_flat, idx, vals, add=False):
    """Per-row scatter: grids_flat (T8, S, 2), idx (T8, N), vals (T8, N, 2).
    Out-of-range indices are DROPPED — callers route a silent (DTX) UE's
    indices out of bounds so its zeros never overwrite a neighbour's REs."""
    def one(g, i, v):
        return (g.at[i].add(v, mode="drop") if add
                else g.at[i].set(v, mode="drop"))

    return jax.vmap(one)(grids_flat, idx, vals)


def _take_rows(tbl, idx):
    """out[t, u, ...] = tbl[t, idx[t, u]] for tbl (T8, Q, ...)."""
    return jax.vmap(lambda tb, i: tb[i])(tbl, idx)


# ---------------------------------------------------------------------------
# the block program
# ---------------------------------------------------------------------------

def make_dyn_block_step(cfg: DynBlockConfig, jit: bool = True):
    """Compile the R-round dynamic block.

    Returns jitted fn(dl_q (Qd, n, dl_tbs) i8, ul_q (Qu, n, ul_tbs) i8,
                      rb_dl (R, 8, n) i32, rb_ul (R, 8, n) i32,
                      key, tti0 i32 [multiple of 8])
      -> dict of per-round stacked outputs:
         dl_ok/dl_new/dl_found/ack_det/ul_ok/ul_new/ul_tx (R, 8, n) bool,
         dl_out (R, 8, n, dl_tbs) i8, ul_out (R, 8, n, ul_tbs) i8,
         rb_ue/rv_dl (R, 8, n) i32, plus scalar counters
         (dl_retx_tx, dl_drop, ul_retx_tx, ul_drop, dci_dl_miss,
         dci_ul_miss) and dl_consumed/ul_consumed (n,).
    """
    c = _consts(cfg)
    cell = cfg.cell
    n, R, l = cfg.n_ues, cfg.R, cfg.l_aggr
    qm_d = ra.dl_mcs_to_qm(cfg.dl_mcs)
    qm_u = ra.ul_mcs_to_qm(cfg.ul_mcs)
    n_re_d = c["base_idx"].shape[0]
    cfg_d = sch.SchConfig(tbs=cfg.dl_tbs, G=n_re_d * qm_d, Qm=qm_d, Nl=1)
    m_sc = 12 * cfg.ul_l_prb
    cfg_u = sch.SchConfig(tbs=cfg.ul_tbs, G=m_sc * 12 * qm_u, Qm=qm_u, Nl=1)
    S = grid_mod.N_SYM * cell.nre
    B = N_PID * n
    dci_len = dci_mod.format0_1a_len(cell.n_prb)
    rl = dci_mod.riv_len(cell.n_prb)
    ngrp = c["ph_re"].shape[0]
    rntis = jnp.asarray(c["rntis"])
    amp = jnp.asarray(c["amp"])
    S_pil, P = c["pidx"].shape
    n_cand = c["cand"].shape[2]
    tmat = jnp.asarray(c["tmat"])  # (14, S_pil)
    rvseq = jnp.asarray(RV_SEQ)
    uidx = jnp.arange(n, dtype=jnp.int32)
    sdt = jnp.bfloat16 if cfg.llr_bits <= 16 else jnp.float32

    def _win_slice(rg, rb, w_sc):
        """(T8, S, 2) grid -> (T8, n, N_SYM*w_sc, 2) contiguous
        frequency windows at 12*rb[t, u] (dynamic_slice clamps garbage
        rb from undecoded DCIs into range; those rows are masked off
        downstream).  Pair with a static window-relative take."""
        T8 = rg.shape[0]
        g14 = rg.reshape(T8, grid_mod.N_SYM, cell.nre, 2)

        def one(g, r):
            return jax.lax.dynamic_slice(
                g, (0, 12 * r, 0), (grid_mod.N_SYM, w_sc, 2))

        win = jax.vmap(lambda g, rr: jax.vmap(
            lambda r: one(g, r))(rr))(g14, rb)
        return win.reshape(T8, rb.shape[1], grid_mod.N_SYM * w_sc, 2)

    def _win_add(flat_g, rb, wcont, w_sc):
        """Add per-(t,u) (N_SYM*w_sc, 2) window contents into the
        (T8, S, 2) grid at 12*rb[t, u] — the TX inverse of _win_slice.
        Sequential over u (per-TTI allocations are disjoint; a gated-off
        UE contributes zeros, which add back unchanged)."""
        T8 = flat_g.shape[0]
        g14 = flat_g.reshape(T8, grid_mod.N_SYM, cell.nre, 2)
        w4 = wcont.reshape(T8, rb.shape[1], grid_mod.N_SYM, w_sc, 2)

        def one_u(u, g):
            def one_t(gt, r, w):
                cur = jax.lax.dynamic_slice(
                    gt, (0, 12 * r, 0), (grid_mod.N_SYM, w_sc, 2))
                return jax.lax.dynamic_update_slice(
                    gt, cur + w, (0, 12 * r, 0))

            return jax.vmap(one_t)(g, rb[:, u], w4[:, u])

        g14 = jax.lax.fori_loop(0, n, one_u, g14)
        return g14.reshape(T8, S, 2)

    def _chest_at(h_ls, k, sym):
        """CE at traced REs: h_ls (T8, n, S_pil, P, 2); k/sym (T8, n, Np).
        Returns (T8, n, Np, 2)."""
        gi = jnp.moveaxis(jnp.take(jnp.asarray(c["fidx"]), k, axis=1),
                          0, 3)  # (T8, n, Np, S_pil, 2)
        gw = jnp.moveaxis(jnp.take(jnp.asarray(c["fw"]), k, axis=1), 0, 3)
        h = jnp.take_along_axis(
            h_ls[:, :, None],               # (T8, n, 1, S_pil, P, 2)
            gi[..., None].repeat(2, -1),    # (T8, n, Np, S_pil, 2, 2)
            axis=-2)
        h_f = (h * gw[..., None]).sum(-2)   # (T8, n, Np, S_pil, 2)
        sw = jnp.take(tmat, sym, axis=0)    # (T8, n, Np, S_pil)
        return (h_f * sw[..., None]).sum(-2)

    def _pdcch_tx(dci_bits, cce, sfs):
        """(T8, n, dci_len) bits at traced CCEs -> (idx, syms) scatter."""
        T8 = dci_bits.shape[0]
        flatb = dci_bits.reshape(T8 * n, -1)
        w = crc_mod.crc_attach(flatb, crc_mod.LTE_CRC16)
        mask = pdcch_mod.rnti_mask_bits(
            jnp.broadcast_to(rntis[None], (T8, n)))
        masked = jnp.concatenate(
            [w[:, :dci_len], w[:, dci_len:] ^ mask.reshape(T8 * n, 16)],
            axis=1)
        coded = convcoder.conv_encode(masked)
        e = pdcch_mod.CCE_BITS * l
        bits = convcoder.rate_match_cc(coded, e)
        coff = (cce * pdcch_mod.CCE_BITS)[..., None] + jnp.arange(e)
        call = jnp.take(jnp.asarray(c["c_all10"]), sfs, axis=0)
        cseq = jnp.take_along_axis(
            jnp.broadcast_to(call[:, None, :], (T8, n, call.shape[-1])),
            coff, axis=-1)
        scr = (bits.reshape(T8, n, e) ^ cseq).astype(jnp.int8)
        syms = modem.modulate(scr.reshape(T8 * n, e), modem.QPSK)
        rows = jnp.take(jnp.asarray(pdcch_mod.cce_re_indices(cell)),
                        cce[..., None] + jnp.arange(l), axis=0)
        return rows.reshape(T8, n * l * 36), syms.reshape(T8, n * l * 36, 2)

    def step(dl_q, ul_q, rb_dl, rb_ul, key, tti0):

        def round_body(carry, xs):
            (dl_tb, dl_pend, dl_retx, dl_ndi, ue_ndi, ue_soft, dl_ptr,
             ul_tb_ue, ue_pend, ue_retx, ue_ndi_ul, ul_ptr, ue_rb_prev,
             enb_pend, enb_retx, enb_ndi_ul, enb_rb_prev, enb_soft,
             phich_tx, counters, key) = carry
            rb_dl_r, rb_ul_r, tti_r = xs
            key, k_pil, k_cand, k_pdsch, k_ul = jax.random.split(key, 5)
            sfs = (tti_r + jnp.arange(N_PID, dtype=jnp.int32)) % 10
            pid = jnp.broadcast_to(
                jnp.arange(N_PID, dtype=jnp.int32)[:, None], (N_PID, n))

            # ------------- eNB scheduling decisions -------------
            new_dl = ~dl_pend
            take = new_dl.astype(jnp.int32)
            idx_q = dl_ptr[None, :] + jnp.cumsum(take, axis=0) - take
            fresh = jax.vmap(lambda qq, ii: qq[ii], in_axes=(1, 1),
                             out_axes=1)(dl_q, idx_q)
            dl_tb = jnp.where(new_dl[..., None], fresh, dl_tb)
            dl_ndi = dl_ndi ^ new_dl
            rv_dl = jnp.where(new_dl, 0, rvseq[jnp.minimum(dl_retx, 3)])
            dl_ptr = dl_ptr + take.sum(0)

            new_ul = ~enb_pend
            enb_ndi_ul = enb_ndi_ul ^ new_ul
            rv_ul_enb = jnp.where(new_ul, 0,
                                  rvseq[jnp.minimum(enb_retx, 3)])
            rb_enb = jnp.where(new_ul, rb_ul_r, enb_rb_prev)

            # ------------- eNB DL encode -------------
            cce_d = jnp.take(jnp.asarray(c["cce_dl"]), sfs, axis=0)
            cce_u = jnp.take(jnp.asarray(c["cce_ul"]), sfs, axis=0)
            d1a = _pack_dci1a(cfg, rb_dl_r, pid,
                              dl_ndi.astype(jnp.int32), rv_dl)
            d0b = _pack_dci0(cfg, rb_ul_r, enb_ndi_ul.astype(jnp.int32))
            i1, s1 = _pdcch_tx(d1a, cce_d, sfs)
            i0, s0 = _pdcch_tx(d0b, cce_u, sfs)

            cinit_d = ((rntis[None, :] << 14) + (sfs[:, None] << 9)
                       + cell.cell_id).reshape(-1)
            cw = sch.encode_tb(dl_tb.reshape(B, cfg.dl_tbs), cfg_d,
                               rv_b=rv_dl.reshape(B))
            scr = scrambling.scramble_bits(cw, cinit_d)
            syms_d = modem.modulate(scr, modem.MOD_FROM_QM[qm_d])
            grids = jnp.take(jnp.asarray(c["base10"]), sfs, axis=0)
            flat = grids.reshape(N_PID, S, 2)
            flat = _scatter_rows(flat, i1, s1)
            flat = _scatter_rows(flat, i0, s0)
            # PDSCH onto the grid as per-(t,u) windows (data REs are
            # zero in the base grid, so add == set)
            wd_sc = 12 * cfg.dl_l_crbs
            wc = jnp.zeros((N_PID, n, grid_mod.N_SYM * wd_sc, 2))
            wc = wc.at[:, :, jnp.asarray(c["dl_win_idx"])].set(
                syms_d.reshape(N_PID, n, n_re_d, 2))
            flat = _win_add(flat, rb_dl_r, wc, wd_sc)
            # PHICH: previous round's UL CRCs at (group, seq) from the
            # previous round's PRBs + n_dmrs=u (36.213 §9.1.2)
            g_ph = (enb_rb_prev + uidx[None]) % ngrp
            s_ph = (enb_rb_prev // ngrp + uidx[None]) % (2 * phich_mod.NSF)
            ph = jnp.zeros((N_PID, ngrp, 8))
            val = jnp.where(phich_tx, 1.0, -1.0)
            ph = jax.vmap(lambda p, g, s, v: p.at[g, s].add(v))(
                ph, g_ph, s_ph, val)
            sm = jnp.take(jnp.asarray(c["ph_sm"]), sfs, axis=0)
            phs = jnp.einsum("tgs,tsic->tgic", ph, sm)
            flat = _scatter_rows(
                flat,
                jnp.broadcast_to(jnp.asarray(c["ph_re"].reshape(-1))[None],
                                 (N_PID, ngrp * 12)),
                phs.reshape(N_PID, -1, 2))
            tx = ofdm.modulate(
                flat.reshape(N_PID, grid_mod.N_SYM, cell.nre, 2),
                cell.n_prb)

            # ------------- DL channel + UE receive (RE-sparse) -------
            rg_tx = ofdm.demodulate(tx, cell.n_prb).reshape(N_PID, S, 2)
            a2 = amp / np.sqrt(2)
            p_tx = jnp.take(rg_tx, jnp.asarray(c["pidx"].reshape(-1)),
                            axis=-2)
            y_p = (p_tx.reshape(N_PID, 1, S_pil, P, 2)
                   + a2[None, :, None, None, None]
                   * jax.random.normal(k_pil, (N_PID, n, S_pil, P, 2)))
            r_p = jnp.take(jnp.asarray(c["ch_vals10"]), sfs, axis=0)
            h_ls = cplx.mul_conj(y_p, r_p[:, None])

            # PDCCH blind decode over the candidate set; chest via the
            # fully-static flattened tap tables (_cand_taps)
            cre = jnp.take(jnp.asarray(c["cand_re"]), sfs, axis=0)
            npos = n_cand * 36 * l
            y_c = (jnp.take_along_axis(
                rg_tx, cre.reshape(N_PID, -1)[..., None], axis=-2)
                   .reshape(N_PID, n, npos, 2)
                   + a2[None, :, None, None]
                   * jax.random.normal(k_cand, (N_PID, n, npos, 2)))
            cti = jnp.take(jnp.asarray(c["ct_idx"]), sfs, axis=0)
            ctw = jnp.take(jnp.asarray(c["ct_w"]), sfs, axis=0)
            hflat = h_ls.reshape(N_PID, n, S_pil * P, 2)
            g_c = jnp.take_along_axis(
                hflat, cti.reshape(N_PID, n, -1)[..., None], axis=-2)
            h_c = (g_c.reshape(N_PID, n, npos, -1, 2)
                   * ctw[..., None]).sum(-2)
            x_eq, csi = chest.equalize_zf(y_c, h_c)
            llr_c = modem.demod_soft(x_eq.reshape(-1, npos, 2), modem.QPSK)
            llr_c = (llr_c.reshape(N_PID, n, npos * 2)
                     * jnp.repeat(csi.reshape(N_PID, n, npos), 2, -1))
            cnd = jnp.take(jnp.asarray(c["cand"]), sfs, axis=0)
            e = 72 * l
            coff = (cnd * 72)[..., None] + jnp.arange(e)
            call = jnp.take(jnp.asarray(c["c_all10"]), sfs, axis=0)
            cseq = jnp.take_along_axis(
                jnp.broadcast_to(call[:, None, None, :],
                                 (N_PID, n, n_cand, call.shape[-1])),
                coff, axis=-1)
            sgn = 1.0 - 2.0 * cseq.astype(jnp.float32)
            llr_c = llr_c.reshape(N_PID, n, n_cand, e) * sgn
            streams = convcoder.rate_unmatch_cc(
                llr_c.reshape(-1, e), dci_len + 16)
            bits_c = viterbi.viterbi_decode(streams)
            calc = crc_mod.crc_bits(bits_c[:, :dci_len], crc_mod.LTE_CRC16)
            resid = (calc ^ bits_c[:, dci_len:]).astype(jnp.int32)
            w16 = jnp.asarray([1 << (15 - i) for i in range(16)], jnp.int32)
            resid = (resid * w16).sum(-1).reshape(N_PID, n, n_cand)
            ok_c = resid == rntis[None, :, None].astype(jnp.int32)
            bits_c = bits_c[:, :dci_len].reshape(N_PID, n, n_cand, dci_len)

            def pick(hit):
                i = jnp.argmax(hit, axis=-1)  # first passing candidate
                b = jnp.take_along_axis(
                    bits_c,
                    i[..., None, None].repeat(dci_len, -1), axis=2)[:, :, 0]
                cpos = jnp.take_along_axis(cnd, i[..., None], axis=-1)[..., 0]
                return hit.any(-1), b, cpos

            dl_found, dl_bits, dl_cce_ue = pick(ok_c & (bits_c[..., 0] == 1))
            ul_found, ul_bits, _ = pick(ok_c & (bits_c[..., 0] == 0))

            rb_ue = _unriv(_int_of(dl_bits[..., 2 : 2 + rl]),
                           cfg.dl_l_crbs, cell.n_prb)
            off = 2 + rl + 5
            ndi_d = dl_bits[..., off + 3].astype(jnp.int32)
            rv_d_ue = _int_of(dl_bits[..., off + 4 : off + 6])
            rb_u_ue = _unriv(_int_of(ul_bits[..., 2 : 2 + rl]),
                             cfg.ul_l_prb, cell.n_prb)
            ndi_u = ul_bits[..., 2 + rl + 5].astype(jnp.int32)

            # UE PHICH decode from the waveform (previous round's feedback)
            php = jnp.take(jnp.asarray(c["ph_re"]),
                           (ue_rb_prev + uidx[None]) % ngrp,
                           axis=0)  # (T8, n, 12)
            y_ph = (jnp.take_along_axis(
                rg_tx, php.reshape(N_PID, -1)[..., None], axis=-2)
                .reshape(N_PID, n, 12, 2)
                + a2[None, :, None, None]
                * jax.random.normal(key, (N_PID, n, 12, 2)))
            h_ph = _chest_at(h_ls, php % cell.nre, php // cell.nre)
            x_ph, csi_ph = chest.equalize_zf(y_ph, h_ph)
            x_ph = x_ph * csi_ph[..., None]
            smt = jnp.take(jnp.asarray(c["ph_sm"]), sfs, axis=0)  # (8,8,12,2)
            s_ue = (ue_rb_prev // ngrp + uidx[None]) % (2 * phich_mod.NSF)
            w_ph = _take_rows(smt, s_ue)  # (T8, n, 12, 2)
            phich_ack_ue = (x_ph[..., 0] * w_ph[..., 0]
                            + x_ph[..., 1] * w_ph[..., 1]).sum(-1) > 0

            # UE PDSCH decode at the DECODED allocation (soft-combining);
            # chest via the padded-pilot WINDOW (one contiguous per-(t,u)
            # slice + static tap takes, _dl_window_taps)
            dwin = _win_slice(rg_tx, rb_ue, 12 * cfg.dl_l_crbs)
            y_d = (dwin[:, :, jnp.asarray(c["dl_win_idx"])]
                   + a2[None, :, None, None]
                   * jax.random.normal(k_pdsch, (N_PID, n, n_re_d, 2)))
            h_pad = jnp.concatenate(
                [h_ls[..., :1, :], h_ls, h_ls[..., -1:, :]], axis=-2)
            W = int(c["dl_W"])
            widx = (2 * rb_ue)[..., None, None] + jnp.arange(W)
            win = jnp.take_along_axis(
                h_pad,
                jnp.broadcast_to(widx[..., None],
                                 (N_PID, n, S_pil, W, 1)), axis=-2)
            hf = []
            for i in range(S_pil):
                gi = jnp.take(win[:, :, i],
                              jnp.asarray(c["dl_tap_idx"][i]), axis=-2)
                hf.append((gi * jnp.asarray(
                    c["dl_tap_w"][i])[None, None, :, :, None]).sum(-2))
            h_f = jnp.stack(hf, axis=2)  # (T8, n, S_pil, n_re, 2)
            h_d = jnp.einsum("rs,tusrc->turc",
                             jnp.asarray(c["dl_tw"]), h_f)
            x_eq, csi = chest.equalize_zf(y_d, h_d)
            llr = modem.demod_soft(x_eq.reshape(B, n_re_d, 2),
                                   modem.MOD_FROM_QM[qm_d])
            llr = llr * jnp.repeat(csi.reshape(B, n_re_d), qm_d, axis=-1)
            llr = scrambling.scramble_llrs(llr, cinit_d)
            is_new_ue = dl_found & (ndi_d != ue_ndi)
            ue_ndi = jnp.where(dl_found, ndi_d, ue_ndi)
            keep = ((~is_new_ue).reshape(B, 1) if cfg.combine
                    else jnp.zeros((B, 1), bool))
            ue_soft = tuple(sb * keep for sb in ue_soft)
            llr = llr * dl_found.reshape(B, 1)  # missed DCI adds nothing
            dl_out, dl_ok, ue_soft, _ = sch.decode_tb(
                llr, cfg_d, softbuf=list(ue_soft),
                use_pallas=cfg.use_pallas, llr_bits=cfg.llr_bits,
                rv_b=rv_d_ue.reshape(B))
            ue_soft = tuple(ue_soft)
            dl_ok = dl_ok.reshape(N_PID, n) & dl_found

            # ------------- UE transmit -------------
            is_new_ul = ul_found & (ndi_u != ue_ndi_ul)
            ue_ndi_ul = jnp.where(ul_found, ndi_u, ue_ndi_ul)
            retx_now = (ue_pend & (~phich_ack_ue) & (~is_new_ul)
                        & (ue_retx < cfg.max_tx))
            take_u = is_new_ul.astype(jnp.int32)
            idx_qu = ul_ptr[None, :] + jnp.cumsum(take_u, axis=0) - take_u
            fresh_u = jax.vmap(lambda qq, ii: qq[ii], in_axes=(1, 1),
                               out_axes=1)(ul_q, idx_qu)
            ul_tb_ue = jnp.where(is_new_ul[..., None], fresh_u, ul_tb_ue)
            ul_ptr = ul_ptr + take_u.sum(0)
            tx_ul = is_new_ul | retx_now
            rv_ue = jnp.where(is_new_ul, 0,
                              rvseq[jnp.minimum(ue_retx, 3)])
            ue_retx = jnp.where(is_new_ul, 1,
                                jnp.where(retx_now, ue_retx + 1, ue_retx))
            rb_ul_ue = jnp.where(is_new_ul, rb_u_ue, ue_rb_prev)
            ue_rb_prev = jnp.where(tx_ul, rb_ul_ue, ue_rb_prev)
            ue_pend = tx_ul  # awaiting feedback iff we just transmitted

            cinit_u = ((rntis[None, :] << 14) + (sfs[:, None] << 9)
                       + cell.cell_id).reshape(-1)
            cw_u = sch.encode_tb(ul_tb_ue.reshape(B, cfg.ul_tbs), cfg_u,
                                 rv_b=rv_ue.reshape(B))
            il = pusch_mod.interleave(cw_u, qm_u)
            scr_u = scrambling.scramble_bits(il, cinit_u)
            s_u = modem.modulate(scr_u, modem.MOD_FROM_QM[qm_u])
            x_u = dft.dft(s_u.reshape(B, 12, m_sc, 2), ortho=True)
            # per-UE arrival gain: the link-budget difference rides the
            # UE's signal into the SHARED eNB noise floor (min-amp link),
            # so each UE sees its own snr_db at the eNB — one crushed
            # link no longer poisons its neighbours' uplink
            gain = jnp.min(amp) / amp  # (n,)
            gtx = tx_ul * gain[None]  # 0 = DTX without a grant
            x_u = x_u * gtx.reshape(B, 1, 1, 1)
            ug = jnp.zeros((N_PID, S, 2))
            # data + DMRS as one per-(t,u) window add; a DTX UE's gain
            # gate zeroes its window, so its stale rb adds nothing and
            # cannot disturb a neighbour's REs
            dv = jnp.take(jnp.asarray(c["ul_dmrs10"]), sfs, axis=0)
            dvb = dv[:, None] * gtx[..., None, None, None]
            uwc = jnp.zeros((N_PID, n, grid_mod.N_SYM * m_sc, 2))
            uwc = uwc.at[:, :, jnp.asarray(c["ul_d_win"])].set(
                x_u.reshape(N_PID, n, -1, 2))
            uwc = uwc.at[:, :, jnp.asarray(c["ul_m_win"])].set(
                dvb.reshape(N_PID, n, -1, 2))
            ug = _win_add(ug, rb_ul_ue, uwc, m_sc)
            # PUCCH HARQ-ACK at n1 = nCCE of the decoded DL DCI (N1=0)
            pvals = jnp.take(jnp.asarray(c["p_vals"]), sfs, axis=0)
            pv = _take_rows(pvals, dl_cce_ue)  # (T8, n, 2, 7, 12, 2)
            d0a = jnp.where(dl_ok, 1.0, -1.0)
            dmask = jnp.asarray(c["p_dmask"])
            scale = (dmask[None, None, None, :, None]
                     * d0a[..., None, None, None]
                     + (1.0 - dmask)[None, None, None, :, None])
            pcon = (pv * scale[..., None]
                    * (dl_found * gain[None])[..., None, None, None, None])
            ppos = jnp.take(jnp.asarray(c["p_pos"]), dl_cce_ue, axis=0)
            ug = _scatter_rows(ug, ppos.reshape(N_PID, -1),
                               pcon.reshape(N_PID, -1, 2), add=True)
            utx = ofdm.modulate(
                ug.reshape(N_PID, grid_mod.N_SYM, cell.nre, 2), cell.n_prb)
            urx = utx + jnp.min(amp) * jax.random.normal(
                k_ul, utx.shape) / np.sqrt(2)

            # ------------- eNB receive -------------
            urg = ofdm.demodulate(urx, cell.n_prb).reshape(N_PID, S, 2)
            uwin = _win_slice(urg, rb_enb, m_sc)
            yd = uwin[:, :, jnp.asarray(c["ul_m_win"])].reshape(
                N_PID, n, 2, m_sc, 2)
            rref = jnp.take(jnp.asarray(c["ul_dmrs10"]), sfs, axis=0)
            h_lsu = cplx.mul_conj(yd, rref[:, None])
            k5 = 5
            pad = jnp.pad(h_lsu,
                          ((0, 0),) * 3 + ((k5 // 2, k5 // 2), (0, 0)),
                          mode="edge")
            sm_u = sum(pad[..., i : i + m_sc, :] for i in range(k5)) / k5
            noise_u = jnp.mean(
                cplx.abs2(h_lsu - sm_u).reshape(N_PID, n, -1), -1) * 1.25
            t_w = (np.array(pusch_mod.DATA_SYMS, np.float32) - 3.0) / 7.0
            ce_u = (jnp.asarray(1.0 - t_w)[None, None, :, None, None]
                    * sm_u[:, :, 0:1]
                    + jnp.asarray(t_w)[None, None, :, None, None]
                    * sm_u[:, :, 1:2])
            yu = uwin[:, :, jnp.asarray(c["ul_d_win"])].reshape(
                N_PID, n, 12, m_sc, 2)
            xeq_u, csi_u = chest.equalize_mmse(yu, ce_u, noise_u)
            xtd = dft.idft(xeq_u.reshape(B, 12, m_sc, 2), ortho=True)
            llr_u = modem.demod_soft(xtd.reshape(B, 12 * m_sc, 2),
                                     modem.MOD_FROM_QM[qm_u])
            w_u = jnp.mean(csi_u.reshape(B, 12, m_sc), axis=-1)
            llr_u = llr_u * jnp.repeat(w_u, m_sc * qm_u, axis=-1)
            llr_u = scrambling.scramble_llrs(llr_u, cinit_u)
            llr_u = pusch_mod.deinterleave(llr_u, qm_u)
            enb_soft = tuple(sb * (~new_ul).reshape(B, 1)
                             for sb in enb_soft)
            ul_out, ul_ok, enb_soft, _ = sch.decode_tb(
                llr_u, cfg_u, softbuf=list(enb_soft),
                use_pallas=cfg.use_pallas, llr_bits=cfg.llr_bits,
                rv_b=rv_ul_enb.reshape(B))
            enb_soft = tuple(enb_soft)
            ul_ok = ul_ok.reshape(N_PID, n)

            # PUCCH ACK matched filter at the eNB's own CCE (DTX-aware)
            pv_e = _take_rows(pvals, cce_d)
            ppos_e = jnp.take(jnp.asarray(c["p_pos"]), cce_d, axis=0)
            yp = jnp.take_along_axis(
                urg, ppos_e.reshape(N_PID, -1)[..., None], axis=-2)
            yp = yp.reshape(N_PID, n, 2, 7, 12, 2)
            prod = cplx.mul_conj(yp, pv_e)
            dm = dmask[None, None, None, :, None]
            corr = (prod * dm[..., None]).sum(axis=(-4, -3, -2)) / (
                12 * 2 * len(pucch_mod.F1_DATA_SYMS))
            # normalize by the known per-UE power-control gain so one
            # DTX threshold serves every link budget
            corr = corr / gain[None, :, None]
            ack_det = ((cplx.abs2(corr) > cfg.ack_thresh)
                       & (corr[..., 0] > 0))

            # ------------- HARQ state updates -------------
            dl_txs = jnp.where(new_dl, 1, dl_retx + 1)
            dl_drop = (~ack_det) & (dl_txs >= cfg.max_tx)
            dl_pend = (~ack_det) & (~dl_drop)
            dl_retx = jnp.where(dl_pend, dl_txs, 0)

            ul_txs = jnp.where(new_ul, 1, enb_retx + 1)
            ul_drop = (~ul_ok) & (ul_txs >= cfg.max_tx)
            enb_pend = (~ul_ok) & (~ul_drop)
            enb_retx = jnp.where(enb_pend, ul_txs, 0)
            enb_rb_prev = rb_enb
            phich_tx = ul_ok  # next round's PHICH payload

            counters = dict(
                dl_retx_tx=counters["dl_retx_tx"]
                + (~new_dl).sum(dtype=jnp.int32),
                dl_drop=counters["dl_drop"] + dl_drop.sum(dtype=jnp.int32),
                ul_retx_tx=counters["ul_retx_tx"]
                + retx_now.sum(dtype=jnp.int32),
                ul_drop=counters["ul_drop"] + ul_drop.sum(dtype=jnp.int32),
                dci_dl_miss=counters["dci_dl_miss"]
                + (~dl_found).sum(dtype=jnp.int32),
                dci_ul_miss=counters["dci_ul_miss"]
                + (~ul_found).sum(dtype=jnp.int32),
            )
            out = dict(
                dl_ok=dl_ok, dl_out=dl_out.reshape(N_PID, n, -1),
                dl_new=new_dl, dl_found=dl_found, ack_det=ack_det,
                ul_ok=ul_ok, ul_out=ul_out.reshape(N_PID, n, -1),
                ul_new=is_new_ul, ul_tx=tx_ul,
                rb_ue=rb_ue, rv_dl=rv_dl,
            )
            carry = (dl_tb, dl_pend, dl_retx, dl_ndi, ue_ndi, ue_soft,
                     dl_ptr, ul_tb_ue, ue_pend, ue_retx, ue_ndi_ul,
                     ul_ptr, ue_rb_prev, enb_pend, enb_retx, enb_ndi_ul,
                     enb_rb_prev, enb_soft, phich_tx, counters, key)
            return carry, out

        z8n = jnp.zeros((N_PID, n), jnp.int32)
        f8n = jnp.zeros((N_PID, n), bool)
        zc = jnp.zeros((), jnp.int32)
        carry0 = (
            jnp.zeros((N_PID, n, cfg.dl_tbs), jnp.int8), f8n, z8n, f8n,
            z8n,
            tuple(sch.init_softbuffer(B, cfg_d, sdt)),
            jnp.zeros((n,), jnp.int32),
            jnp.zeros((N_PID, n, cfg.ul_tbs), jnp.int8), f8n, z8n, z8n,
            jnp.zeros((n,), jnp.int32), z8n,
            f8n, z8n, f8n, z8n,
            tuple(sch.init_softbuffer(B, cfg_u, sdt)),
            jnp.ones((N_PID, n), bool),
            dict(dl_retx_tx=zc, dl_drop=zc, ul_retx_tx=zc, ul_drop=zc,
                 dci_dl_miss=zc, dci_ul_miss=zc),
            key,
        )
        ttis = tti0 + N_PID * jnp.arange(R, dtype=jnp.int32)
        carry, outs = jax.lax.scan(round_body, carry0,
                                   (rb_dl, rb_ul, ttis))
        outs.update(carry[-2])
        outs["dl_consumed"] = carry[6]
        outs["ul_consumed"] = carry[11]
        return outs

    return jax.jit(step) if jit else step


class DynBlockRunner:
    """Bridge between an ATTACHED WaveformNetwork's L2/L3 stacks and the
    dynamic block program: per block, the host muxes up to T TTIs of MAC
    PDUs per UE from the RLC entities into the payload queues, runs ONE
    device call for R rounds of dynamically-scheduled HARQ-carrying PHY,
    and feeds the decoded TBs back into the stacks in queue order.

    The mux window is SPECULATIVE: TBs the block did not consume (their
    slots were taken by retransmissions) are dropped and recover via RLC
    AM — the same T-TTI speculation trade as SpsBlockRunner, extended to
    a dynamic grant/HARQ loop.  Delivery happens at recovery time, so a
    TB that needed two IR transmissions arrives 8 TTIs late, exactly the
    8-process cadence."""

    def __init__(self, net, R: int = 3, dl_mcs: int = 10, ul_mcs: int = 10,
                 use_pallas: bool = False):
        from ..stack import pdu as pdu_mod

        self.pdu = pdu_mod
        self.net = net
        mac = net.enb.mac
        cell = net.cell
        rntis = sorted(r for r, u in mac.ues.items()
                       if u.state == "RRC_CONNECTED")
        assert rntis, "no RRC-connected UEs to run in dyn-block mode"
        n = len(rntis)
        c0, c1 = waveblock.centre_prbs(cell.n_prb)
        usable = (c0 - 0) + (cell.n_prb - c1)
        w = max(1, usable // n)
        lo = _pucch_region(cell)
        wu = max(1, (cell.n_prb - 2 * lo) // n)
        while wu > 1 and not pusch_mod.valid_n_prb(wu):
            wu -= 1
        med = net.medium
        by_crnti = {ue.stack.crnti: i for i, ue in enumerate(net.ues)}
        self.ue_idx = [by_crnti[r] for r in rntis]
        snr = tuple(
            float(med.tx_power_dbm - med.pathloss_db[self.ue_idx[i]]
                  - med.noise_floor_dbm)
            for i in range(n))
        self.cfg = DynBlockConfig(
            cell=cell, rntis=tuple(rntis), dl_l_crbs=w, dl_mcs=dl_mcs,
            ul_l_prb=wu, ul_mcs=ul_mcs, snr_db=snr, R=R,
            use_pallas=use_pallas)
        self.step = make_dyn_block_step(self.cfg)
        self._key = jax.random.PRNGKey(net.tti + 23)
        self._sched_seed = net.tti
        self.metrics = dict(blocks=0, dl_tb=0, dl_ok=0, ul_tb=0, ul_ok=0,
                            dl_retx=0, ul_retx=0, dl_drop=0, ul_drop=0,
                            dci_miss=0)

    def _mux(self, rlc_map, tbs_bytes: int) -> bytes:
        subs, room = [], tbs_bytes - 4
        for lcid in sorted(rlc_map):
            while room > 8 and rlc_map[lcid].has_data():
                p = rlc_map[lcid].read_pdu(room - 4)
                if p is None:
                    break
                subs.append((lcid, p))
                room -= len(p) + 3
        return self.pdu.pack(subs, tb_size=tbs_bytes)

    def run_block(self) -> dict:
        net, cfg = self.net, self.cfg
        T, n = cfg.T, cfg.n_ues
        mac = net.enb.mac
        dtb, utb = cfg.dl_tbs // 8, cfg.ul_tbs // 8
        dl = np.zeros((T, n, dtb), np.uint8)
        ul = np.zeros((T, n, utb), np.uint8)
        for t in range(T):
            for i, r in enumerate(cfg.rntis):
                dl[t, i] = np.frombuffer(
                    self._mux(mac.ues[r].rlc, dtb), np.uint8)
                ust = net.ues[self.ue_idx[i]].stack
                ul[t, i] = np.frombuffer(self._mux(ust.rlc, utb), np.uint8)
            getattr(mac, "tick", lambda: None)()
        self._sched_seed += 1
        rb_dl, rb_ul = make_schedule(cfg, seed=self._sched_seed)
        self._key, k = jax.random.split(self._key)
        out = self.step(
            jnp.asarray(np.unpackbits(dl, axis=-1).astype(np.int8)),
            jnp.asarray(np.unpackbits(ul, axis=-1).astype(np.int8)),
            jnp.asarray(rb_dl), jnp.asarray(rb_ul), k,
            jnp.asarray((net.tti + 7) // 8 * 8 % 10240, jnp.int32))
        out = {k2: np.asarray(v) for k2, v in out.items()}
        dl_out = np.packbits(out["dl_out"].astype(np.uint8), axis=-1)
        ul_out = np.packbits(out["ul_out"].astype(np.uint8), axis=-1)
        m = self.metrics
        for r in range(cfg.R):
            for t in range(N_PID):
                tti = net.tti + r * N_PID + t
                for i, rnti in enumerate(cfg.rntis):
                    ust = net.ues[self.ue_idx[i]].stack
                    if out["dl_new"][r, t, i]:
                        m["dl_tb"] += 1
                    if out["ul_new"][r, t, i]:
                        m["ul_tb"] += 1
                    if out["dl_ok"][r, t, i]:
                        m["dl_ok"] += 1
                        ust.tb_decoded(tti, dl_out[r, t, i].tobytes(),
                                       cfg.snr_db[i], rnti=rnti)
                        ust.get_pucch(tti)
                    if out["ul_ok"][r, t, i]:
                        m["ul_ok"] += 1
                        mac.ul_pdu(tti, rnti, ul_out[r, t, i].tobytes(),
                                   cfg.snr_db[i])
                    if hasattr(ust, "tick"):
                        ust.tick()
        m["dl_retx"] += int(out["dl_retx_tx"])
        m["ul_retx"] += int(out["ul_retx_tx"])
        m["dl_drop"] += int(out["dl_drop"])
        m["ul_drop"] += int(out["ul_drop"])
        m["dci_miss"] += int(out["dci_dl_miss"]) + int(out["dci_ul_miss"])
        m["blocks"] += 1
        net.tti += T
        return out


def make_bench_step(cfg: DynBlockConfig, n_cells: int = 1):
    """Bench variant: reduces outputs on device to scalars (no bulk
    readback over the remote device link).

    n_cells > 1 vmaps the whole block over independent cells (the
    emulation's many-eNB scenario: each cell carries its own payload
    queues, schedule, channel randomness, and HARQ state; sums are
    aggregated across cells on device).  Per-cell semantics are
    identical to n_cells=1 — the cells share nothing but the chip.
    """
    step = make_dyn_block_step(cfg, jit=False)

    def bench(dl_q, ul_q, rb_dl, rb_ul, key, tti0):
        o = step(dl_q, ul_q, rb_dl, rb_ul, key, tti0)
        return (o["dl_ok"].sum(), o["ul_ok"].sum(), o["ack_det"].sum(),
                o["dl_retx_tx"], o["ul_retx_tx"],
                o["dci_dl_miss"] + o["dci_ul_miss"])

    if n_cells == 1:
        return jax.jit(bench)

    vb = jax.vmap(bench, in_axes=(0, 0, 0, 0, 0, None))

    def agg(dl_q, ul_q, rb_dl, rb_ul, keys, tti0):
        return tuple(x.sum() for x in vb(
            dl_q, ul_q, rb_dl, rb_ul, keys, tti0))

    return jax.jit(agg)
