"""Waveform-native network: the FULL UE life cycle through the device PHY.

No message bus below RRC: cell search -> PSS/SSS/CP detect -> MIB ->
SIB1/SIB2 -> PRACH (detected by eNB root-sequence correlation) -> RAR ->
Msg3/contention resolution -> RRC + NAS attach -> IP traffic, every step
carried as OFDM waveforms through per-link pathloss + AWGN channels.

Reference behavior: the stock srsLTE ZMQ IQ mode (`lib/src/phy/rf/
rf_zmq_imp.c`) where UE and eNB exchange raw samples, the UE sync state
machine (`srsue/src/phy/sync.cc:364-470` CELL_SEARCH -> SFN_SYNC ->
CAMPING), `srsenb/src/phy/sf_worker.cc` (UL decode then DL encode per TTI)
and `srsue/src/phy/cc_worker.cc` (fft/chest -> PDCCH blind search ->
PDSCH decode; PUSCH/PUCCH/PRACH encode).

The SAME L2/L3 stacks as the message-level path (`stack/enb_stack.py`,
`stack/ue_stack.py`) drive these adapters — MAC/RLC/PDCP/RRC/NAS are
shared, only the PHY transport differs, exactly the reference's layering.

TPU design: compilation is cached PER GRANT SHAPE, not per subframe plan —
the eNB builds a base grid per (sf_idx, pbch-phase) and applies each
grant with a jitted (sf, alloc, mcs)-keyed kernel; the UE caches
blind-search and PDSCH-decode kernels the same way.  The combinatorial
space of concurrent-grant plans never reaches the compiler.  Crucially
the cache is UE-COUNT-INDEPENDENT: RNTIs and CCE positions are traced
arguments (pdcch.encode_dyn; scrambling c_init flows through the on-device
gold-sequence op), the UE's blind search decodes the FULL aligned CCE
space once per subframe with per-RNTI adjudication as a host integer
compare (pdcch.blind_search_all), and PUCCH detection batches all
resources of the format-1 region into one matched-filter tensor.

Transport-format convention: the DCI carries (RIV, I_MCS) and BOTH sides
derive the transport block size from the same 36.213 tables (phch/ra.py);
the MAC payload rides inside the TBS behind a 2-byte length prefix (the
MAC padding-subheader role).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cplx, ofdm, sequence  # noqa: F401 (sequence: doc link)
from ..phch import chest, dci as dci_mod, grid as grid_mod, pbch as pbch_mod
from ..phch import pcfich as pcfich_mod, pdcch as pdcch_mod
from ..phch import pdsch as pdsch_mod, phich as phich_mod, prach as prach_mod
from ..phch import pucch as pucch_mod, pusch as pusch_mod, ra
from ..phch import sch, sync as sync_mod
from ..utils import config as _cfg_mod  # noqa: F401


PRACH_SF = 1  # PRACH occasion subframe (prach-ConfigIndex 3 role)
PRACH_K0 = 12  # first PRACH bin (prach-FreqOffset 1 PRB at 1.25 kHz x12)
N_PUCCH_RES = 32  # format-1 resources scanned: 16 ACK + 16 SR (m=0 region)


def _srate_div(n_prb: int) -> int:
    """PRACH synthesis decimation: 30.72 Msps / cell sample rate."""
    return 30720 // ofdm.params(n_prb)["sf_len"]


def _dl_mcs_for(payload_len: int, n_prb_alloc: int) -> int:
    """Smallest EVEN I_MCS whose 36.213 TBS fits the payload + length
    prefix (even-only halves the compiled-kernel population; both sides
    derive the TBS from the DCI so any consistent choice is valid)."""
    need = (payload_len + 2) * 8
    for mcs in range(0, 29, 2):
        if ra.dl_tbs(mcs, n_prb_alloc) >= need:
            return mcs
    if ra.dl_tbs(27, n_prb_alloc) >= need:
        return 27
    raise ValueError(f"payload {payload_len}B exceeds any TBS on "
                     f"{n_prb_alloc} PRBs")


def _frame(payload: bytes, tbs: int) -> np.ndarray:
    """(1, tbs) bits: 2-byte length prefix + payload + zero pad."""
    buf = np.zeros((tbs + 7) // 8, np.uint8)
    buf[0] = len(payload) >> 8
    buf[1] = len(payload) & 0xFF
    buf[2 : 2 + len(payload)] = np.frombuffer(bytes(payload), np.uint8)
    return np.unpackbits(buf)[None, :tbs].astype(np.int8)


def _unframe(bits: np.ndarray) -> bytes:
    by = np.packbits(np.asarray(bits, np.uint8).ravel()).tobytes()
    n = (by[0] << 8) | by[1]
    if n > len(by) - 2:
        return b""  # corrupted length field counts as a CRC miss
    return by[2 : 2 + n]


class _CellKernels:
    """Per-cell jitted kernel cache, shared by the eNB and every UE."""

    def __init__(self, cell: grid_mod.CellConfig):
        self.cell = cell
        self.dci_len = dci_mod.format0_1a_len(cell.n_prb)

    # ---- eNB side ----

    @functools.lru_cache(maxsize=None)
    def base_grid(self, sf_idx: int, with_pbch: int):
        """Jitted base subframe: PSS/SSS + PCFICH (+ PBCH for sfn%4 phase).
        Takes mib bits; returns the (1, 14, NRE, 2) grid."""
        cell = self.cell

        def run(mib_bits):
            g = cplx.zeros((1, grid_mod.N_SYM, cell.nre))
            g = sync_mod.put_pss_sss(g, cell, sf_idx)
            # CRS on every subframe (put_base role) — pdsch.encode would
            # re-place them, but control-only subframes (and the PBCH
            # subframe itself) must still carry pilots for UE chest
            g = pdsch_mod.put_crs(g, cell, sf_idx)
            g = pcfich_mod.encode(jnp.full((1,), cell.cfi, jnp.int32),
                                  cell, sf_idx, g)
            if with_pbch >= 0 and sf_idx == 0:
                g = pbch_mod.encode(mib_bits, cell, with_pbch, g)
            return g

        return jax.jit(run)

    @functools.lru_cache(maxsize=None)
    def add_dl_grant(self, sf_idx: int, rb_start: int,
                     l_crbs: int, mcs: int, l_aggr: int):
        """Jitted: place one DCI-1A + its PDSCH into the grid.  rnti and
        cce_start are traced — one kernel per (sf, alloc, mcs, L)."""
        cell = self.cell
        prb_mask = ra.type2_to_prb_mask(rb_start, l_crbs, cell.n_prb)
        tbs = ra.dl_tbs(mcs, l_crbs)
        qm = ra.dl_mcs_to_qm(mcs)
        n_re = grid_mod.nof_re(cell, sf_idx, prb_mask)
        cfg = sch.SchConfig(tbs=tbs, G=n_re * qm, Qm=qm, Nl=1)

        def run(grid, dci_bits, payload_bits, rnti, cce_start):
            g = pdcch_mod.encode_dyn(dci_bits, rnti, l_aggr, cce_start,
                                     cell, sf_idx, grid)
            return pdsch_mod.encode(payload_bits, cfg, cell, sf_idx,
                                    rnti, prb_mask, grid=g)

        return jax.jit(run), tbs

    @functools.lru_cache(maxsize=None)
    def add_ul_dci(self, sf_idx: int, l_aggr: int):
        cell = self.cell

        def run(grid, dci_bits, rnti, cce_start):
            return pdcch_mod.encode_dyn(dci_bits, rnti, l_aggr, cce_start,
                                        cell, sf_idx, grid)

        return jax.jit(run)

    @functools.lru_cache(maxsize=None)
    def add_phich(self, sf_idx: int):
        cell = self.cell

        def run(grid, acks):
            return phich_mod.encode(acks, cell, sf_idx, grid)

        return jax.jit(run)

    @functools.lru_cache(maxsize=None)
    def modulate(self):
        cell = self.cell
        return jax.jit(lambda g: ofdm.modulate(g, cell.n_prb))

    # ---- UE side ----

    @functools.lru_cache(maxsize=None)
    def rx_front(self, sf_idx: int):
        """OFDM demod + channel estimate + PCFICH, one jitted call."""
        cell = self.cell

        def run(samples):
            rg = ofdm.demodulate(samples, cell.n_prb)
            ch = chest.estimate(rg, cell, sf_idx)
            cfi, _ = pcfich_mod.decode(rg, ch.ce, cell, sf_idx)
            return rg, ch.ce, ch.snr_db, cfi

        return jax.jit(run)

    @functools.lru_cache(maxsize=None)
    def blind_all(self, sf_idx: int):
        """Decode the FULL aligned CCE space once; per-RNTI adjudication
        happens on the host (resid == rnti).  One kernel per subframe, no
        matter how many RNTIs are watched."""
        cell, dci_len = self.cell, self.dci_len
        positions = list(pdcch_mod.full_space(cell))

        def run(rg, ce):
            bits, resid, _ = pdcch_mod.blind_search_all(rg, ce, cell,
                                                        sf_idx, dci_len)
            return bits, resid

        return jax.jit(run), positions

    @functools.lru_cache(maxsize=None)
    def pdsch_rx(self, sf_idx: int, rb_start: int, l_crbs: int, mcs: int):
        cell = self.cell
        prb_mask = ra.type2_to_prb_mask(rb_start, l_crbs, cell.n_prb)
        tbs = ra.dl_tbs(mcs, l_crbs)
        qm = ra.dl_mcs_to_qm(mcs)
        n_re = grid_mod.nof_re(cell, sf_idx, prb_mask)
        cfg = sch.SchConfig(tbs=tbs, G=n_re * qm, Qm=qm, Nl=1)

        def run(rg, rnti):
            payload, ok, _, _ = pdsch_mod.decode(rg, cfg, cell, sf_idx,
                                                 rnti, prb_mask)
            return payload, ok

        return jax.jit(run)

    @functools.lru_cache(maxsize=None)
    def phich_rx(self, sf_idx: int):
        cell = self.cell

        def run(rg, ce):
            return phich_mod.decode(rg, ce, cell, sf_idx)

        return jax.jit(run)

    @functools.lru_cache(maxsize=None)
    def pbch_rx(self):
        cell = self.cell

        def run(rg):
            ch0 = chest.estimate(rg, cell, 0, port=0)
            ch1 = chest.estimate(rg, cell, 0, port=1)
            return pbch_mod.decode(rg, ch0.ce, cell, ce_port1=ch1.ce)

        return jax.jit(run)

    # ---- uplink ----

    @functools.lru_cache(maxsize=None)
    def pusch_tx(self, sf_idx: int, rb_start: int, l_prb: int, mcs: int):
        cell = self.cell
        tbs = ra.ul_tbs(min(mcs, 28), l_prb)
        qm = ra.ul_mcs_to_qm(min(mcs, 28))
        cfg = sch.SchConfig(tbs=tbs, G=12 * l_prb * 12 * qm, Qm=qm, Nl=1)

        def run(bits, rnti):
            g = pusch_mod.encode(bits, cfg, cell, sf_idx, rnti,
                                 rb_start, l_prb)
            return ofdm.modulate(g, cell.n_prb)

        return jax.jit(run), tbs

    @functools.lru_cache(maxsize=None)
    def pusch_rx(self, sf_idx: int, rb_start: int, l_prb: int, mcs: int):
        cell = self.cell
        tbs = ra.ul_tbs(min(mcs, 28), l_prb)
        qm = ra.ul_mcs_to_qm(min(mcs, 28))
        cfg = sch.SchConfig(tbs=tbs, G=12 * l_prb * 12 * qm, Qm=qm, Nl=1)

        def run(samples, rnti):
            rg = ofdm.demodulate(samples, cell.n_prb)
            payload, ok, _, _ = pusch_mod.decode(rg, cfg, cell, sf_idx,
                                                 rnti, rb_start, l_prb)
            return payload, ok

        return jax.jit(run)

    # ---- PUCCH: every format-1 resource of the region as ONE tensor ----

    @functools.lru_cache(maxsize=None)
    def _pucch_wf(self, sf_idx: int):
        """(N_RES, sf_len, 2) x2 numpy: time-domain DMRS part and data
        part per resource; a UE's transmission is W_dmrs[r] + d0*W_data[r]
        (format 1 is affine in d(0); OFDM is linear)."""
        cell = self.cell
        g_d, g_x = [], []
        one = jnp.asarray([[1.0, 0.0]], jnp.float32)
        zero = jnp.asarray([[0.0, 0.0]], jnp.float32)
        for r in range(N_PUCCH_RES):
            g0 = cplx.zeros((1, grid_mod.N_SYM, cell.nre))
            g_d.append(pucch_mod.encode_f1(zero, cell, sf_idx, r, g0))
            g_x.append(pucch_mod.encode_f1(one, cell, sf_idx, r, g0))
        grids = jnp.concatenate(g_d + g_x, axis=0)
        wf = np.asarray(ofdm.modulate(grids, cell.n_prb))
        return wf[:N_PUCCH_RES], wf[N_PUCCH_RES:] - wf[:N_PUCCH_RES]

    @functools.lru_cache(maxsize=None)
    def pucch_tx(self, sf_idx: int):
        """Jitted (res_idx, d0) -> (1, sf_len, 2); resource is traced."""
        w_dmrs, w_data = self._pucch_wf(sf_idx)
        wd = jnp.asarray(w_dmrs)
        wx = jnp.asarray(w_data)

        def run(r, d0):
            return wd[r][None] + cplx.mul(
                jnp.broadcast_to(d0[:, None, :], (1,) + wx.shape[1:]),
                wx[r][None])

        return jax.jit(run)

    @functools.lru_cache(maxsize=None)
    def pucch_rx_all(self, sf_idx: int):
        """eNB: matched-filter ALL resources in one kernel.
        (B, sf_len, 2) -> (corr (B, N_RES, 2), energy (B, N_RES))."""
        cell = self.cell
        idx, ref = [], []
        for r in range(N_PUCCH_RES):
            wf = pucch_mod._f1_waveform(cell.cell_id, sf_idx, r)
            for s in range(2):
                prb = pucch_mod.pucch_prb(r, 2 * sf_idx + s, cell.n_prb)
                ks = 12 * prb + np.arange(12)
                for l in pucch_mod.F1_DATA_SYMS:
                    if r == 0:
                        idx.append(((7 * s + l) * cell.nre + ks))
                    ref.append(wf[s, l])
        n_mf = len(idx)  # 2 slots x data syms
        idx = np.asarray(idx, np.int32).reshape(-1)              # (n_mf*12,)
        ref = np.asarray(ref, np.complex64).reshape(
            N_PUCCH_RES, n_mf, 12)
        refc = cplx.from_numpy(np.conj(ref))

        def run(samples):
            rg = ofdm.demodulate(samples, cell.n_prb)
            B = rg.shape[0]
            flat = rg.reshape(B, -1, 2)
            y = jnp.take(flat, jnp.asarray(idx), axis=-2)
            y = y.reshape(B, 1, n_mf, 12, 2)
            prod = cplx.mul(y, refc[None])
            corr = prod.sum(axis=(-3, -2)) / (12 * n_mf)
            return corr, cplx.abs2(corr)

        return jax.jit(run)


def _ack_res(rnti: int) -> int:
    return rnti % 16


def _sr_res(rnti: int) -> int:
    return 16 + rnti % 16


class WaveEnbPhy:
    """eNB waveform PHY: UL decode then DL encode per TTI (sf_worker.cc)."""

    PUCCH_DETECT = 4.0  # matched-filter energy threshold vs noise

    def __init__(self, medium: "WaveMedium", cell: grid_mod.CellConfig,
                 mac, kern: _CellKernels):
        self.medium = medium
        self.cell = cell
        self.mac = mac
        self.k = kern
        self._pending_ul = {}  # tti -> [(UlGrant, tbs)]
        self.metrics = {"prach_det": 0, "pusch_ok": 0, "pusch_crc": 0,
                        "pucch_det": 0, "dl_tx": 0}

    def run_tti(self, tti: int):
        self._rx(tti)
        getattr(self.mac, "tick", lambda: None)()
        self._tx(tti)

    # ---- uplink (previous TTI's superposed samples) ----
    def _rx(self, tti: int):
        rx = self.medium.ul_take()
        if rx is None:
            return
        samples, had_prach, prev_tti = rx
        sf = prev_tti % 10
        div = _srate_div(self.cell.n_prb)
        if had_prach and sf == PRACH_SF:
            freq = prach_mod.rx_waveform_to_freq(
                samples[:, : prach_mod.waveform_len(0, div)],
                k0=PRACH_K0, srate_div=div)
            det, metric, _ = prach_mod.detect(freq, 0, 1)
            for idx in np.nonzero(np.asarray(det)[0])[0]:
                self.metrics["prach_det"] += 1
                self.mac.rach_detected(prev_tti, int(idx))
        for g, tbs in self._pending_ul.pop(prev_tti, ()):
            fn = self.k.pusch_rx(sf, g.rb_start, g.l_prb, g.mcs)
            bits, ok = fn(samples, jnp.asarray(g.rnti, jnp.int32))
            ok = bool(np.asarray(ok)[0])
            self.mac.ul_crc_info(tti, g.rnti, ok)
            if ok:
                payload = _unframe(np.asarray(bits)[0])
                self.metrics["pusch_ok"] += 1
                self.mac.ul_pdu(tti, g.rnti, payload, 20.0)
            else:
                self.metrics["pusch_crc"] += 1
        # PUCCH: ONE matched-filter tensor covers every resource; per-UE
        # adjudication is an array lookup
        if getattr(self.mac, "ues", None):
            corr, energy = self.k.pucch_rx_all(sf)(samples)
            corr = np.asarray(corr)[0]
            energy = np.asarray(energy)[0]
            for rnti in list(self.mac.ues):
                if energy[_ack_res(rnti)] > self.PUCCH_DETECT:
                    ack = bool(corr[_ack_res(rnti), 0] > 0)
                    self.metrics["pucch_det"] += 1
                    try:
                        self.mac.ack_info(tti, rnti, ack, cc=0)
                    except TypeError:
                        self.mac.ack_info(tti, rnti, ack)
                if energy[_sr_res(rnti)] > self.PUCCH_DETECT:
                    self.mac.sr_detected(tti, rnti)

    # ---- downlink ----
    def _tx(self, tti: int):
        sf = tti % 10
        sfn = (tti // 10) % 1024
        dl_grants = self.mac.get_dl_sched(tti)
        ul_grants = self.mac.get_ul_sched(tti)
        phich = self.mac.get_phich(tti)
        mib = np.zeros((1, 24), np.int8)
        with_pbch = sfn % 4 if sf == 0 else -1
        if sf == 0:
            mib = np.asarray(pbch_mod.pack_mib(
                self.cell.n_prb, sfn))[None].astype(np.int8)
        grid = self.k.base_grid(sf, with_pbch)(jnp.asarray(mib))
        for g in dl_grants:
            prbs = [i for i, on in enumerate(g.prb_mask) if on]
            rb_start, l_crbs = prbs[0], len(prbs)
            mcs = _dl_mcs_for(len(g.payload), l_crbs)
            fn, tbs = self.k.add_dl_grant(sf, rb_start, l_crbs,
                                          mcs, g.l_aggr)
            d = dci_mod.DciDl("1A", mcs=mcs, harq_pid=g.harq_pid & 7,
                              ndi=g.ndi & 1, rv=g.rv & 3,
                              rb_start=rb_start, l_crbs=l_crbs)
            bits = dci_mod.pack_dl(d, self.cell.n_prb)[None]
            grid = fn(grid, jnp.asarray(bits),
                      jnp.asarray(_frame(g.payload, tbs)),
                      jnp.asarray(g.rnti, jnp.int32),
                      jnp.asarray(g.cce_start, jnp.int32))
            self.metrics["dl_tx"] += 1
        for g in ul_grants:
            # the MAC's shared _CceAlloc already placed this DCI-0 on a
            # true search-space candidate, collision-free vs the DL DCIs.
            # Quantize link-adaptation MCS to even (see _dl_mcs_for) —
            # the UE reads the DCI, so both ends agree per grant
            g.mcs = min(g.mcs, 28) & ~1
            d = dci_mod.DciUl(mcs=min(g.mcs, 28), ndi=g.ndi & 1,
                              rb_start=g.rb_start, l_crbs=max(1, g.l_prb),
                              cqi_req=0)
            bits = dci_mod.pack_ul(d, self.cell.n_prb)[None]
            grid = self.k.add_ul_dci(sf, g.l_aggr)(
                grid, jnp.asarray(bits), jnp.asarray(g.rnti, jnp.int32),
                jnp.asarray(g.cce_start, jnp.int32))
            tbs = ra.ul_tbs(min(g.mcs, 28), max(1, g.l_prb))
            self._pending_ul.setdefault(tti, []).append((g, tbs))
        if phich:
            acks = np.zeros((1, phich_mod.n_groups(self.cell.n_prb), 8),
                            np.float32)
            for ph in phich:
                acks[0, 0, ph["rnti"] % 8] = 1.0 if ph["ack"] else -1.0
            grid = self.k.add_phich(sf)(grid, jnp.asarray(acks))
        self.medium.dl_put(tti, self.k.modulate()(grid))


class WaveUePhy:
    """UE waveform PHY: sync state machine + per-TTI full receive chain
    (sync.cc:364-470 + cc_worker.cc), driving the unmodified UeStack."""

    def __init__(self, medium: "WaveMedium", cell: grid_mod.CellConfig,
                 stack, kern: _CellKernels, ue_idx: int):
        self.medium = medium
        self.cell = cell
        self.stack = stack
        self.k = kern
        self.ue_idx = ue_idx
        self.state = "CELL_SEARCH"
        self.metrics = {"dci_hit": 0, "tb_ok": 0, "tb_err": 0,
                        "prach_tx": 0, "pusch_tx": 0, "pucch_tx": 0}
        if getattr(stack, "serving_pci", None) is None:
            stack.serving_pci = cell.cell_id

    def run_tti(self, tti: int, samples=None, batch=None):
        """samples: this UE's (1, sf_len, 2) row; batch: the network's
        shared per-TTI front-end products (rg/ce/snr/resid for ALL UEs,
        computed in one device call) — None falls back to per-UE calls."""
        if samples is None:
            samples = self.medium.dl_take(self.ue_idx)
        sf = tti % 10
        if self.state == "CELL_SEARCH":
            if sf in (0, 5):
                self._cell_search(samples)
        elif self.state == "MIB":
            if sf == 0:
                self._mib(tti, samples)
        elif batch is not None:
            self._camp_rx_row(tti, batch)
        else:
            self._camp_rx(tti, samples)
        if getattr(self.stack, "tick", None) is not None:
            self.stack.tick()
        if self.state == "CAMP":
            self._tx(tti)

    def _cell_search(self, samples):
        """PSS/SSS + CP detection (sync.cc CELL_SEARCH via ue_cell_search)."""
        res = sync_mod.cell_search(samples, detect_cp=True)
        q = float(np.asarray(res["quality"])[0])
        cid = int(np.asarray(res["cell_id"])[0])
        if q > 10.0 and cid == self.cell.cell_id:
            self.state = "MIB"

    def _mib(self, tti, samples):
        rg = ofdm.demodulate(samples, self.cell.n_prb)
        mib, ports, off, ok = self.k.pbch_rx()(rg)
        if bool(np.asarray(ok)[0]):
            info = pbch_mod.unpack_mib(np.asarray(mib)[0])
            self.stack.mib_received(tti, dict(
                num_prb=info["n_prb"], num_antennas=int(np.asarray(ports)[0]),
                phich_resources=info.get("phich_res", "1"),
                phich_length=info.get("phich_dur", 0)))
            self.state = "CAMP"

    def _camp_rx(self, tti, samples):
        sf = tti % 10
        rg, ce, snr, cfi = self.k.rx_front(sf)(samples)
        fn, positions = self.k.blind_all(sf)
        bits_dev, resid = fn(rg, ce)
        batch = dict(rg=rg, ce=ce, snr=np.asarray(snr),
                     resid=np.asarray(resid), bits_dev=bits_dev,
                     bits=None, positions=positions, row=0)
        self._camp_rx_row(tti, batch)

    def _camp_rx_row(self, tti, batch):
        """Consume row `batch['row'] or self.ue_idx` of the shared
        batched front-end (rg/ce/resid computed once for every UE)."""
        sf = tti % 10
        row = batch.get("row", self.ue_idx)
        rg = batch["rg"]
        snr_db = float(batch["snr"][row])
        resid = batch["resid"][row]
        sync_cb = getattr(self.stack, "sync_indication", None)
        if sync_cb is not None:
            sync_cb(tti, snr_db > -3.0, snr_db)
        listen = self.stack.listen_rntis(tti)
        pos_idx = {p: i for i, p in enumerate(batch["positions"])}
        rg_row = None
        for rnti in sorted(listen):
            hit_is = [i for c in pdcch_mod.candidates(self.cell, rnti, sf)
                      if (i := pos_idx.get(c)) is not None
                      and resid[i] == rnti]
            if not hit_is:
                continue
            if batch["bits"] is None:
                # one host copy for the WHOLE batch, shared across UEs
                batch["bits"] = np.asarray(batch["bits_dev"])
            bits = batch["bits"][row]
            if rg_row is None:
                rg_row = rg[row : row + 1]
            seen = set()
            for ci in hit_is:
                key = bits[ci].tobytes()
                if key in seen:
                    continue  # same DCI visible at nested aggregations
                seen.add(key)
                self.metrics["dci_hit"] += 1
                self._handle_dci(tti, rg_row, rnti, bits[ci], snr_db)
        # PHICH (UL HARQ feedback)
        if getattr(self.stack, "crnti", None) and \
                getattr(self.stack, "_ul_harq_buf", None) is not None:
            ce = batch["ce"]
            ph = np.asarray(self.k.phich_rx(sf)(
                rg[row : row + 1], ce[row : row + 1]))
            m = float(ph[0, 0, self.stack.crnti % 8])
            if abs(m) > 0.3:
                self.stack.harq_ack(tti, m > 0)

    def _handle_dci(self, tti, rg, rnti, bits, snr_db):
        if dci_mod.is_format0(bits):
            if rnti != getattr(self.stack, "crnti", None):
                return  # UL grants only address our C-RNTI
            u = dci_mod.unpack_ul(bits, self.cell.n_prb)
            from .phy_adapter import UlGrant

            self.stack.ul_grant(tti, UlGrant(
                rnti, u.rb_start, u.l_crbs,
                0 if u.mcs >= 29 else u.mcs, u.ndi,
                u.mcs - 28 if u.mcs >= 29 else 0,
                cqi_request=0))
            return
        d = dci_mod.unpack_dl(bits, self.cell.n_prb, "1A")
        if d.l_crbs < 1 or d.rb_start + d.l_crbs > self.cell.n_prb:
            return  # CRC alias: impossible allocation
        fn = self.k.pdsch_rx(tti % 10, d.rb_start, d.l_crbs, d.mcs)
        payload_bits, ok = fn(rg, jnp.asarray(rnti, jnp.int32))
        ok = bool(np.asarray(ok)[0])
        payload = _unframe(np.asarray(payload_bits)[0]) if ok else None
        self.metrics["tb_ok" if ok else "tb_err"] += 1
        try:
            self.stack.tb_decoded(tti, payload, snr_db, rnti=rnti)
        except TypeError:
            self.stack.tb_decoded(tti, payload, snr_db)

    def _tx(self, tti: int):
        sf = tti % 10
        div = _srate_div(self.cell.n_prb)
        sf_len = ofdm.params(self.cell.n_prb)["sf_len"]
        out = None
        prach_idx = None
        if sf == PRACH_SF:
            # get_prach consumes the pending preamble and records the
            # occasion TTI (RA-RNTI epoch) — only probe ON the occasion
            prach_idx = self.stack.get_prach(tti)
            if prach_idx is not None:
                w = prach_mod.gen_waveform(
                    jnp.asarray([prach_idx]), 0, 1, k0=PRACH_K0,
                    srate_div=div)
                pad = sf_len - w.shape[1]
                out = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))
                self.metrics["prach_tx"] += 1
        for g, payload in self.stack.get_pusch(tti):
            fn, tbs = self.k.pusch_tx(sf, g.rb_start, g.l_prb, g.mcs)
            if (len(payload) + 2) * 8 > tbs:
                payload = payload[: tbs // 8 - 2]
            s = fn(jnp.asarray(_frame(payload, tbs)),
                   jnp.asarray(g.rnti, jnp.int32))
            out = s if out is None else out + s
            self.metrics["pusch_tx"] += 1
        pucch = self.stack.get_pucch(tti)
        if pucch:
            rnti = pucch["rnti"]
            tx = self.k.pucch_tx(sf)
            acks = pucch.get("ack", [])
            if acks:
                d0 = np.array([[1.0 if acks[0] else -1.0, 0.0]], np.float32)
                s = tx(jnp.asarray(_ack_res(rnti), jnp.int32),
                       jnp.asarray(d0))
                out = s if out is None else out + s
                self.metrics["pucch_tx"] += 1
            if pucch.get("sr"):
                d0 = np.array([[1.0, 0.0]], np.float32)
                s = tx(jnp.asarray(_sr_res(rnti), jnp.int32),
                       jnp.asarray(d0))
                out = s if out is None else out + s
                self.metrics["pucch_tx"] += 1
        if out is not None:
            self.medium.ul_put(tti, self.ue_idx, out,
                               is_prach=prach_idx is not None)


class WaveMedium:
    """Per-link pathloss + AWGN, optionally through a 36.101 Annex B.2
    tapped-delay-line fading profile (EPA/EVA/ETU, block fading per
    subframe, the role of the reference's `lib/src/phy/channel/fading.c`
    over its ZMQ path); UL superposes at the eNB with one TTI of latency
    (the eNB decodes TTI n-1's uplink while building TTI n)."""

    def __init__(self, n_ues: int, pathloss_db, tx_power_dbm: float = 30.0,
                 ue_power_dbm: float = 23.0, noise_floor_dbm: float = -104.0,
                 seed: int = 0, fading_profile: str = None,
                 doppler_hz: float = 5.0, srate_hz: float = None):
        self.n_ues = n_ues
        self.pathloss_db = np.asarray(pathloss_db, np.float32)
        self.tx_power_dbm = tx_power_dbm
        self.ue_power_dbm = ue_power_dbm
        self.noise_floor_dbm = noise_floor_dbm
        self.fading_profile = fading_profile
        self.doppler_hz = doppler_hz
        self.srate_hz = srate_hz
        self._key = jax.random.PRNGKey(seed)
        self._dl = None  # (tti, samples)
        self._ul_acc = None
        self._ul_meta = None  # (tti, had_prach)
        self._ul_ready = None

    def _split(self):
        self._key, k = jax.random.split(self._key)
        return k

    # eNB -> UEs
    def dl_put(self, tti: int, samples):
        self._dl = (tti, samples)
        # rotate UL: what UEs sent last TTI becomes available to the eNB
        self._ul_ready = (self._ul_acc, self._ul_meta)
        self._ul_acc = None
        self._ul_meta = None

    def dl_take_all(self):
        """(n_ues, sf_len, 2): every UE's receive samples in ONE batch —
        one noise draw, per-link amplitudes broadcast down the batch
        axis.  The whole network's downlink front-end then runs as a
        single compiled call per TTI."""
        tti, tx = self._dl
        if self.fading_profile is not None:
            from ..ops import fading as fading_mod

            x = jnp.broadcast_to(tx, (self.n_ues,) + tx.shape[1:])
            tx, _ = fading_mod.apply_fading(
                x, jax.random.fold_in(jax.random.PRNGKey(77), tti),
                self.fading_profile, self.srate_hz,
                doppler_hz=self.doppler_hz, sf_time_s=tti * 1e-3)
        snr_db = (self.tx_power_dbm - self.pathloss_db
                  - self.noise_floor_dbm)  # (n_ues,)
        amp = jnp.asarray(10.0 ** (-snr_db / 20.0))[:, None, None]
        noise = jax.random.normal(
            self._split(), (self.n_ues,) + tx.shape[-2:]) / np.sqrt(2.0)
        return tx + amp * noise

    def dl_take(self, ue_idx: int):
        tti, tx = self._dl
        snr_db = (self.tx_power_dbm - float(self.pathloss_db[ue_idx])
                  - self.noise_floor_dbm)
        # unit-power signal + noise scaled for the link SNR
        noise_amp = 10.0 ** (-snr_db / 20.0)
        noise = noise_amp * jax.random.normal(
            self._split(), tx.shape) / np.sqrt(2.0)
        return tx + noise

    # UEs -> eNB
    def ul_put(self, tti: int, ue_idx: int, samples, is_prach: bool = False):
        snr_db = (self.ue_power_dbm - float(self.pathloss_db[ue_idx])
                  - self.noise_floor_dbm)
        amp = 10.0 ** (snr_db / 20.0)
        s = samples * amp
        self._ul_acc = s if self._ul_acc is None else self._ul_acc + s
        self._ul_meta = (tti, (self._ul_meta or (tti, False))[1] or is_prach)

    def ul_take(self):
        if self._ul_ready is None or self._ul_ready[0] is None:
            return None
        acc, (tti, had_prach) = self._ul_ready
        self._ul_ready = None
        noise = jax.random.normal(self._split(), acc.shape) / np.sqrt(2.0)
        return acc + noise, had_prach, tti


class WaveformNetwork:
    """One eNB + N UEs, everything over waveforms.  run(n_ttis) drives the
    TTI loop; the eNB transmits first each TTI (UEs see tti's DL, their UL
    reaches the eNB at tti+1 — the 1-TTI turnaround of txrx.cc)."""

    def __init__(self, enb_mac, ue_stacks, pathloss_db, n_prb: int = 6,
                 cell_id: int = 1, seed: int = 0, cfi: int = 2,
                 fading_profile: str = None, doppler_hz: float = 5.0):
        self.cell = grid_mod.CellConfig(n_prb=n_prb, cell_id=cell_id,
                                        cfi=cfi)
        # the waveform grid is compiled at ONE cfi, so the MAC's CCE
        # search spaces must be computed at the same one: pin it (message
        # mode instead escalates CFI with demand, enb_stack.get_dl_sched)
        assert enb_mac.n_prb == n_prb, "MAC/PHY bandwidth mismatch"
        enb_mac.fixed_cfi = cfi
        self.kern = _CellKernels(self.cell)
        self.medium = WaveMedium(
            len(ue_stacks), pathloss_db, seed=seed,
            fading_profile=fading_profile, doppler_hz=doppler_hz,
            srate_hz=ofdm.params(n_prb)["sf_len"] * 1e3)
        self.enb = WaveEnbPhy(self.medium, self.cell, enb_mac, self.kern)
        self.ues = [WaveUePhy(self.medium, self.cell, st, self.kern, i)
                    for i, st in enumerate(ue_stacks)]
        self.tti = 0

    def run(self, n_ttis: int):
        for _ in range(n_ttis):
            self.enb.run_tti(self.tti)
            sf = self.tti % 10
            # ONE noise draw and ONE front-end/blind-search call for the
            # whole UE population: the batch axis replaces the per-UE
            # receive loop (the framework's core TPU design)
            samples = self.medium.dl_take_all()
            batch = None
            if any(ue.state == "CAMP" for ue in self.ues):
                rg, ce, snr, cfi = self.kern.rx_front(sf)(samples)
                fn, positions = self.kern.blind_all(sf)
                bits_dev, resid = fn(rg, ce)
                batch = dict(rg=rg, ce=ce, snr=np.asarray(snr),
                             resid=np.asarray(resid), bits_dev=bits_dev,
                             bits=None, positions=positions)
            for i, ue in enumerate(self.ues):
                row = dict(batch, row=i) if batch is not None else None
                if row is not None:
                    row["bits"] = batch["bits"]
                ue.run_tti(self.tti, samples[i : i + 1], row)
                if row is not None and row["bits"] is not None:
                    batch["bits"] = row["bits"]  # share the host copy
            self.tti += 1
