"""TTI loop driving a whole emulated network — the txrx.cc / sync.cc clock.

Reference behavior: eNB `txrx` thread (txrx.cc:105-145) and UE `sync` thread
pace one TTI per ms, RX->TX turnaround 4 ms (TX_DELAY, common.h:45).

Here one loop steps every node each TTI (faster than real time unless the bus
is paced); nodes are the phy adapters which pull/push through their stacks.
"""

from __future__ import annotations


class Network:
    def __init__(self, bus):
        self.bus = bus
        self.nodes = []  # phy adapters with .run_tti(tti)

    def add(self, node):
        self.nodes.append(node)
        return node

    def run(self, n_ttis: int):
        # sleep/wake: a node may skip TTIs that carry nothing for it
        # (dormant UEs at deployment scale); timers catch up on its next
        # real run.  Probe/run pairs bound once per run() call.
        pairs = [(getattr(n, "skip_tti", None), n.run_tti)
                 for n in self.nodes]
        step = self.bus.step_tti
        for _ in range(n_ttis):
            tti = self.bus.curr_tti
            for probe, run in pairs:
                if probe is None or not probe(tti):
                    run(tti)
            step()
