"""MBMS gateway: SGi-mb ingress -> GTP-U multicast -> eNB PMCH queues.

Reference behavior: `srsepc/src/mbms-gw/mbms-gw.cc` — reads the SGi-mb TUN,
wraps packets in GTP-U and multicasts them on M1-U (mbms-gw.cc:210-231),
pairing with the eNB's eMBMS/PMCH transmission.
"""

from __future__ import annotations

from . import spgw as spgw_mod

M1U_TEID = 0xFFFF0001  # common multicast TEID


class MbmsGw:
    def __init__(self, area_id: int = 1):
        self.area_id = area_id
        self.enb_sinks = []  # callables receiving (area_id, gtpu_packet)
        self.metrics = dict(mcast_bytes=0, pkts=0)

    def add_enb(self, sink):
        self.enb_sinks.append(sink)

    def handle_sgi_mb_pdu(self, ip_pkt: bytes):
        """Multicast one downlink packet to every attached eNB (M1-U)."""
        frame = spgw_mod.gtpu_encap(M1U_TEID, ip_pkt)
        for sink in self.enb_sinks:
            sink(self.area_id, frame)
        self.metrics["mcast_bytes"] += len(ip_pkt)
        self.metrics["pkts"] += 1


def enb_pmch_sink(queue):
    """eNB-side M1-U receiver: decap and queue for PMCH scheduling."""

    def sink(area_id, gtpu_frame):
        teid, payload = spgw_mod.gtpu_decap(gtpu_frame)
        if teid == M1U_TEID:
            queue.append((area_id, payload))

    return sink
