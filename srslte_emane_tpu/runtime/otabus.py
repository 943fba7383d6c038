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
        self._t0 = time.monotonic()

    def send_msg(self, frame: otamsg.OtaFrame):
        """Transmit during the current TTI (MHAL send_msg)."""
        self._pending.append(frame)

    def step_tti(self):
        """Close the current TTI: adjudicate SINR for all emissions and
        enqueue (frame, tester) at each receiver; advance the clock."""
        testers = sinr_mod.adjudicate(
            self._pending, self.prop, self.n_prb, self.node_ids,
            roles=self.roles
        )
        for fr in self._pending:
            if self._rx_of is None:
                rx = self.node_ids
            else:
                rx = self._rx_of["ue" if fr.txc.is_downlink else "enb"]
            for rid in rx:
                if rid == fr.src:
                    continue
                self._delivered[rid].append((fr, testers[(id(fr), rid)]))
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
