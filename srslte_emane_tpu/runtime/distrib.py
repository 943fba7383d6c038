"""Distributed OTA bus: nodes in separate processes/hosts, one SINR hub.

Reference behavior: the reference runs one OS process per network node
(eNB/UE/EPC) with EMANE's OTA multicast bus between them (SURVEY.md §2.8).
Here an OtaHub process owns the propagation model and TTI barrier; node
processes attach a RemoteBus (same send_msg/get_messages/step_tti surface as
runtime.otabus.OtaBus, so phy adapters run unchanged).  Transport is
length-prefixed pickles over TCP — the host-side DCN path; device-side PHY
state stays local to each node's chips (parallel/mesh).
"""

from __future__ import annotations

import pickle
import socket
import struct
import threading

import numpy as np

from . import sinr as sinr_mod


def _send(sock, obj):
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(struct.pack("!I", len(data)) + data)


def _recv(sock):
    hdr = b""
    while len(hdr) < 4:
        chunk = sock.recv(4 - len(hdr))
        if not chunk:
            raise ConnectionError("peer closed")
        hdr += chunk
    n = struct.unpack("!I", hdr)[0]
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(min(1 << 16, n - len(buf)))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return pickle.loads(buf)


class OtaHub:
    """Central adjudicator: barrier per TTI, SINR for all emissions."""

    def __init__(self, prop: sinr_mod.Propagation, node_ids, n_prb: int,
                 host: str = "127.0.0.1", port: int = 0):
        self.prop = prop
        self.node_ids = list(node_ids)
        self.n_prb = n_prb
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind((host, port))
        self.srv.listen(len(node_ids))
        self.port = self.srv.getsockname()[1]
        self.conns = {}
        self.tti = 0
        self._stop = False
        self.thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self.thread.start()
        return self

    def _run(self):
        # accept one connection per node
        while len(self.conns) < len(self.node_ids) and not self._stop:
            conn, _ = self.srv.accept()
            hello = _recv(conn)
            self.conns[hello["node_id"]] = conn
        # TTI barrier loop
        try:
            while not self._stop:
                frames = []
                for nid, conn in self.conns.items():
                    msg = _recv(conn)
                    if msg.get("bye"):
                        self._stop = True
                        break
                    frames.extend(msg["frames"])
                if self._stop:
                    break
                testers = sinr_mod.adjudicate(frames, self.prop, self.n_prb,
                                              self.node_ids)
                self.tti = (self.tti + 1) % 10240
                for nid, conn in self.conns.items():
                    deliveries = [
                        (fr, testers[(fr.src, nid)]._rb)
                        for fr in frames if fr.src != nid
                    ]
                    _send(conn, dict(tti=self.tti, deliveries=deliveries,
                                     noise=self.prop.noise_floor_dbm))
        except (ConnectionError, OSError):
            pass

    def stop(self):
        self._stop = True
        for c in self.conns.values():
            try:
                c.close()
            except OSError:
                pass
        self.srv.close()


class RemoteBus:
    """Client-side bus facade for one node process (OtaBus-compatible)."""

    def __init__(self, host: str, port: int, node_id: int):
        self.node_id = node_id
        self.sock = socket.create_connection((host, port))
        _send(self.sock, dict(node_id=node_id))
        self.curr_tti = 0
        self._pending = []
        self._delivered = []

    def send_msg(self, frame):
        self._pending.append(frame)

    def step_tti(self):
        _send(self.sock, dict(frames=self._pending))
        self._pending = []
        resp = _recv(self.sock)
        self.curr_tti = resp["tti"]
        for fr, rb in resp["deliveries"]:
            tester = sinr_mod.SinrTester(np.asarray(rb), resp["noise"])
            self._delivered.append((fr, tester))

    def get_messages(self, node_id: int):
        assert node_id == self.node_id
        out = self._delivered
        self._delivered = []
        return out

    def close(self):
        try:
            _send(self.sock, dict(bye=True, frames=[]))
        except OSError:
            pass
        self.sock.close()
