"""Timed TTI message bus — the libemanelte MHAL equivalent.

Reference behavior: `EMANELTE::MHAL::{ENB,UE}::send_msg(msg, tx_control)` and
blocking `get_messages(msgs, &sor_time)` that paces the 1 ms TTI clock
(SURVEY.md §2.3/§5); receive-side messages carry a SINRTester handle.

This in-process bus runs whole emulated networks in one process,
faster-than-real-time by default (the TPU design goal) or paced at 1 kHz
(`paced=True`) to mirror the reference's real-time budget.  Multi-host
operation shards nodes across processes/chips; frames then ride
host-side transport while PHY tensors stay device-resident (parallel/mesh).
"""

from __future__ import annotations

import collections
import time
import typing


from . import otamsg, sinr as sinr_mod


def frame_rnti_set(fr) -> set:
    """RNTIs a DL frame addresses (cached on the frame; shared with the
    UE adapters' dormant filter)."""
    rset = getattr(fr, "_rnti_set", None)
    if rset is None:
        msg = fr.msg
        rset = {d.rnti for d in getattr(msg, "pdcch_dl", ())}
        rset.update(d.rnti for d in getattr(msg, "pdcch_ul", ()))
        rset.update(d.refid for d in getattr(msg, "pdsch", ()))
        fr._rnti_set = rset
    return rset


class OtaBus:
    def __init__(self, prop: sinr_mod.Propagation, node_ids, n_prb: int,
                 paced: bool = False, roles: dict = None):
        self.prop = prop
        self.node_ids = list(node_ids)
        self.n_prb = n_prb
        self.paced = paced
        # optional node_id -> "enb"|"ue" map: with roles known, DL frames
        # are delivered (and adjudicated) only to UEs and UL frames only to
        # eNBs — the EMANE hub's O(tx x rx) fan-out pruned to O(relevant)
        self.roles = roles
        self._rx_of = None if roles is None else {
            "ue": [n for n in self.node_ids if roles.get(n) == "ue"],
            "enb": [n for n in self.node_ids if roles.get(n) == "enb"]}
        self.curr_tti = 0
        self._pending: typing.List[otamsg.OtaFrame] = []
        self._delivered: typing.Dict[int, list] = collections.defaultdict(list)
        # DRX-like receiver sleep registry: node_id -> (until_tti,
        # listen_rnti_set, serving_pci).  While a node sleeps, serving-cell
        # DL frames that address none of its RNTIs are neither delivered
        # nor SINR-adjudicated for it (the EMANE hub's fan-out pruned to
        # receivers that would act on the frame).
        self.sleep_state: typing.Dict[int, tuple] = {}
        self._t0 = time.monotonic()

    def set_sleep(self, node_id: int, until_tti: int, listen, serving_pci):
        self.sleep_state[node_id] = (until_tti, listen, serving_pci)

    def clear_sleep(self, node_id: int):
        self.sleep_state.pop(node_id, None)

    def send_msg(self, frame: otamsg.OtaFrame):
        """Transmit during the current TTI (MHAL send_msg)."""
        self._pending.append(frame)

    def step_tti(self):
        """Close the current TTI: adjudicate SINR for all emissions and
        enqueue (frame, tester) at each receiver; advance the clock.
        Sleeping receivers get neither delivery nor testers for
        serving-cell frames that address none of their RNTIs."""
        tti = self.curr_tti
        sleep = self.sleep_state
        recv = {}
        for fr in self._pending:
            if self._rx_of is None:
                rx = self.node_ids
            else:
                rx = self._rx_of["ue" if fr.txc.is_downlink else "enb"]
            outs = []
            rset = None
            for rid in rx:
                if rid == fr.src:
                    continue
                sl = sleep.get(rid) if fr.txc.is_downlink else None
                # frames delivered now are consumed NEXT tti: keep the one
                # the receiver's wake TTI will process
                if (sl is not None and tti + 1 < sl[0]
                        and fr.txc.phy_cell_id == sl[2]):
                    if rset is None:
                        rset = frame_rnti_set(fr)
                    if not (rset & sl[1]):
                        continue
                outs.append(rid)
            recv[id(fr)] = outs
        testers = sinr_mod.adjudicate(
            self._pending, self.prop, self.n_prb, self.node_ids,
            roles=self.roles, recv=recv
        )
        for fr in self._pending:
            dl = self._delivered
            t = testers
            fid = id(fr)
            for rid in recv[fid]:
                dl[rid].append((fr, t[(fid, rid)]))
        self._pending = []
        self.curr_tti = (self.curr_tti + 1) % 10240
        if self.paced:
            target = self._t0 + self.curr_tti * 1e-3
            delay = target - time.monotonic()
            if delay > 0:
                time.sleep(delay)

    def get_messages(self, node_id: int):
        """Drain messages delivered to `node_id` (MHAL get_messages): list of
        (OtaFrame, SinrTester)."""
        out = self._delivered[node_id]
        self._delivered[node_id] = []
        return out
