"""SPGW: GTP-C session management + GTP-U user-plane tunneling.

Reference behavior: `srsepc/src/spgw/{spgw.cc,gtpc.cc,gtpu.cc}` — select loop
over the S1-U socket and SGi TUN (spgw.cc:114-158), GTP-C create-session
(TEID allocation), GTP-U encap/decap keyed by TEID / UE IP.

Transport here is in-process callable hooks (eNB gtpu <-> spgw) with the
GTP-U v1 header encoded exactly (so PCAPs and later UDP transport are
byte-compatible); SGi is an in-memory IP packet sink/source (TUN optional).
"""

from __future__ import annotations

import struct


def gtpu_encap(teid: int, payload: bytes) -> bytes:
    """GTP-U v1 G-PDU header (8 bytes): flags=0x30, type=0xFF (gtpu.cc)."""
    return struct.pack("!BBHI", 0x30, 0xFF, len(payload), teid) + payload


def gtpu_decap(pkt: bytes):
    flags, mtype, length, teid = struct.unpack("!BBHI", pkt[:8])
    assert mtype == 0xFF, mtype
    return teid, pkt[8 : 8 + length]


class Spgw:
    def __init__(self, ip_pool_base: str = "172.16.0."):
        self.ip_pool_base = ip_pool_base
        self.next_ip = 2
        self.next_teid = 1
        # bearers: ue_ip -> dict(teid_out (eNB side), enb_tx fn)
        self.by_ip = {}
        self.by_teid_in = {}
        self.sgi_out = []  # packets leaving toward the internet
        self.metrics = dict(dl_bytes=0, ul_bytes=0)

    # ---- GTP-C (create session, gtpc.cc) ----
    def handle_gtpc(self, pkt: bytes, enb_tx) -> bytes:
        """S11 endpoint: byte-exact GTPv2-C Create Session Request ->
        Response (the in-process S1-U delivery hook rides alongside the
        message, standing in for the F-TEID's transport address)."""
        from . import gtpc

        req = gtpc.parse_create_session_request(pkt)
        sess = self.create_session(req["imsi"], enb_tx)
        return gtpc.create_session_response(
            sess["ue_ip"], sess["teid_in"], sess["teid_out"], seq=req["seq"])

    def create_session(self, imsi: str, enb_tx):
        """enb_tx(bytes): callable delivering S1-U packets to the eNB.
        Returns dict(ue_ip, teid_in (SPGW's), teid_out (eNB's))."""
        # /16 pool: the host index spills into the third octet so more
        # than 253 sessions allocate valid addresses (sgw_sgi pool role)
        hi, lo = divmod(self.next_ip, 256)
        base = self.ip_pool_base.rstrip(".").rsplit(".", 1)[0]
        ue_ip = f"{base}.{hi}.{lo}"
        self.next_ip += 1
        if lo == 254:
            self.next_ip += 2  # skip .255 (broadcast) and .0
        teid_in = self.next_teid  # our rx teid (eNB sends UL with this)
        teid_out = self.next_teid + 1  # eNB's rx teid (we send DL with it)
        self.next_teid += 2
        self.by_ip[ue_ip] = dict(teid_out=teid_out, teid_in=teid_in,
                                 enb_tx=enb_tx, imsi=imsi)
        self.by_teid_in[teid_in] = ue_ip
        return dict(ue_ip=ue_ip, teid_in=teid_in, teid_out=teid_out)

    def path_switch(self, ue_ip: str, enb_tx):
        """S1 path switch after handover (gtpc.cc modify-bearer): point the
        DL tunnel at the target eNB; TEIDs are preserved."""
        sess = self.by_ip.get(ue_ip)
        if sess is None:
            return False
        sess["enb_tx"] = enb_tx
        return True

    # ---- user plane (spgw.cc:114-158 select loop bodies) ----
    def release_session(self, ue_ip: str):
        """Delete-session (gtpc role): drop the bearer so DL routing to a
        stale tunnel stops and the address mappings do not leak."""
        sess = self.by_ip.pop(ue_ip, None)
        if sess is not None:
            self.by_teid_in.pop(sess["teid_in"], None)

    def handle_sgi_pdu(self, ip_pkt: bytes):
        """Downlink: IP packet from SGi -> lookup by dst IP -> GTP-U to eNB."""
        dst = ".".join(str(b) for b in ip_pkt[16:20])
        sess = self.by_ip.get(dst)
        if sess is None:
            return False
        sess["enb_tx"](gtpu_encap(sess["teid_out"], ip_pkt))
        self.metrics["dl_bytes"] += len(ip_pkt)
        return True

    def handle_s1u_pdu(self, pkt: bytes):
        """Uplink: GTP-U from eNB -> decap -> SGi."""
        teid, ip_pkt = gtpu_decap(pkt)
        if teid not in self.by_teid_in:
            return False
        self.sgi_out.append(ip_pkt)
        self.metrics["ul_bytes"] += len(ip_pkt)
        return True


def make_ipv4(src: str, dst: str, payload: bytes) -> bytes:
    """Minimal IPv4 header for tests/gw loopback."""
    src_b = bytes(int(x) for x in src.split("."))
    dst_b = bytes(int(x) for x in dst.split("."))
    total = 20 + len(payload)
    hdr = struct.pack("!BBHHHBBH", 0x45, 0, total, 0, 0, 64, 17, 0) + src_b + dst_b
    return hdr + payload
