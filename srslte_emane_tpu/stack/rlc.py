"""RLC layer: TM / UM / AM entities (36.322).

Reference behavior: `lib/src/upper/{rlc.cc,rlc_tm.cc,rlc_um.cc,rlc_am.cc}` —
AM = tx/rx windows, segmentation/reassembly with LI fields, poll/status PDUs,
t_reordering + poll_retransmit timers (rlc_am.h:99-230); UM = 5/10-bit SN
reordering window; per-queue metrics (the fork's queue_metrics.h patch).

API mirrors the reference interfaces (ue_interfaces.h:265-321):
  write_sdu(sdu)            <- PDCP
  read_pdu(nof_bytes)->pdu  <- MAC pull (one transmission opportunity)
  write_pdu(pdu)            <- MAC delivery
  sdu_queue_out             -> PDCP delivery callback
Timers tick per TTI via timer_tick().
"""

from __future__ import annotations

import collections
import struct

MOD_UM = 1024  # 10-bit SN
MOD_AM = 1024


# ---------------------------------------------------------------- TM

class RlcTm:
    def __init__(self, deliver):
        self.deliver = deliver
        self.q = collections.deque()
        self.metrics = collections.Counter()

    def write_sdu(self, sdu: bytes):
        self.q.append(bytes(sdu))

    def read_pdu(self, nof_bytes: int):
        if self.q and len(self.q[0]) <= nof_bytes:
            self.metrics["tx_pdus"] += 1
            return self.q.popleft()
        return None

    def write_pdu(self, pdu: bytes):
        self.metrics["rx_pdus"] += 1
        self.deliver(pdu)

    def timer_tick(self):
        pass

    def needs_tick(self) -> bool:
        return False

    def has_data(self):
        return bool(self.q)


# ---------------------------------------------------------------- UM (10-bit SN)

def _pack_li_headers(first_byte_bits: int, sn: int, lis, payload: bytes) -> bytes:
    """Generic UM/AM data-PDU body: [fixed header(2B)] [LI ext fields] payload.
    first_byte_bits carries (FI, E) positioning done by callers."""
    e = 1 if lis else 0
    hdr = bytes([(first_byte_bits | (e << 2) | (sn >> 8)) & 0xFF, sn & 0xFF])
    ext = b""
    for i, li in enumerate(lis):
        last = i == len(lis) - 1
        e_bit = 0 if last else 1
        ext += bytes([(e_bit << 7) | (li >> 4), (li & 0xF) << 4])
        # (byte-aligned 11-bit LI encoding, one LI per 2 bytes — the even-LI
        # packing of 36.322 is bit-level; byte-aligned keeps exactness of
        # content while simplifying the codec; PCAP marks this framing)
    return hdr + ext + payload


def _unpack_li_headers(pdu: bytes):
    b0, b1 = pdu[0], pdu[1]
    e = (b0 >> 2) & 1
    sn = ((b0 & 0x3) << 8) | b1
    pos = 2
    lis = []
    while e:
        e = (pdu[pos] >> 7) & 1
        lis.append(((pdu[pos] & 0x7F) << 4) | (pdu[pos + 1] >> 4))
        pos += 2
    return b0, sn, lis, pdu[pos:]


class RlcUm:
    """UM with 10-bit (default) or 5-bit SN; segmentation + reassembly +
    reordering (36.322 §5.1.2 / rlc_um.cc)."""

    def __init__(self, deliver, t_reordering: int = 35, sn_bits: int = 10):
        assert sn_bits in (5, 10)
        self.deliver = deliver
        self.sn_bits = sn_bits
        self.sn_mod = 1 << sn_bits
        self.tx_q = collections.deque()
        self.tx_sn = 0
        self.rx = {}
        self.vr_ur = 0  # earliest SN still considered for reordering
        self.vr_uh = 0  # highest received + 1
        self.t_reord = 0
        self.t_reordering = t_reordering
        self.partial = b""
        self.partial_fi_ok = False
        self.metrics = collections.Counter()

    def _pack(self, hdr_bits, sn, lis, payload):
        if self.sn_bits == 10:
            return _pack_li_headers(hdr_bits, sn, lis, payload)
        # 5-bit SN: single header byte [FI(2) E(1) SN(5)]
        e = 1 if lis else 0
        fi2 = hdr_bits >> 3  # (fi_start << 1) | fi_end
        hdr = bytes([(fi2 << 6) | (e << 5) | (sn & 0x1F)])
        ext = b""
        for i, li in enumerate(lis):
            last = i == len(lis) - 1
            ext += bytes([((0 if last else 1) << 7) | (li >> 4), (li & 0xF) << 4])
        return hdr + ext + payload

    def _unpack(self, pdu):
        if self.sn_bits == 10:
            return _unpack_li_headers(pdu)
        b0 = pdu[0]
        fi = (b0 >> 6) & 0x3
        e = (b0 >> 5) & 1
        sn = b0 & 0x1F
        pos = 1
        lis = []
        while e:
            e = (pdu[pos] >> 7) & 1
            lis.append(((pdu[pos] & 0x7F) << 4) | (pdu[pos + 1] >> 4))
            pos += 2
        # return in the 10-bit-compatible (b0-with-FI-at-4/3, sn, ...) form
        b0_compat = (fi >> 1) << 4 | (fi & 1) << 3
        return b0_compat, sn, lis, pdu[pos:]

    def write_sdu(self, sdu: bytes):
        self.tx_q.append(bytes(sdu))

    def has_data(self):
        return bool(self.tx_q)

    _carry_start = False  # next PDU begins mid-SDU (previous PDU split one)

    def read_pdu(self, nof_bytes: int):
        """One transmission opportunity: concatenate + segment SDUs into a
        single PDU of at most nof_bytes (36.322 §5.1.2 / rlc_um.cc)."""
        if not self.tx_q or nof_bytes < 4:
            return None
        fi_start = 1 if self._carry_start else 0
        fi_end = 0
        segs, lis = [], []
        room = nof_bytes - 2
        while self.tx_q and room > 0:
            cost_li = 2 if segs else 0  # adding a 2nd+ segment needs one LI
            sdu = self.tx_q[0]
            if len(sdu) + cost_li <= room:
                if segs:
                    lis.append(len(segs[-1]))
                    room -= 2
                segs.append(self.tx_q.popleft())
                room -= len(segs[-1])
            else:
                take = room - cost_li
                if take <= 0:
                    break
                if segs:
                    lis.append(len(segs[-1]))
                segs.append(sdu[:take])
                self.tx_q[0] = sdu[take:]
                fi_end = 1
                break
        if not segs:
            return None
        self._carry_start = fi_end == 1
        hdr_bits = (fi_start << 4) | (fi_end << 3)
        pdu = self._pack(hdr_bits, self.tx_sn, lis, b"".join(segs))
        self.tx_sn = (self.tx_sn + 1) % self.sn_mod
        self.metrics["tx_pdus"] += 1
        return pdu

    def write_pdu(self, pdu: bytes):
        b0, sn, lis, payload = self._unpack(pdu)
        fi_start = (b0 >> 4) & 1
        fi_end = (b0 >> 3) & 1
        self.metrics["rx_pdus"] += 1
        self.rx[sn] = (fi_start, fi_end, lis, payload)
        self._reassemble()

    def _reassemble(self):
        # in-order delivery from vr_ur
        while self.vr_ur in self.rx:
            fi_start, fi_end, lis, payload = self.rx.pop(self.vr_ur)
            pos = 0
            parts = []
            for li in lis:
                parts.append(payload[pos : pos + li])
                pos += li
            parts.append(payload[pos:])
            for i, part in enumerate(parts):
                first, last = i == 0, i == len(parts) - 1
                starts = not (first and fi_start)
                ends = not (last and fi_end)
                if starts and not self.partial:
                    if ends:
                        self.deliver(part)
                        self.metrics["rx_sdus"] += 1
                    else:
                        self.partial = part
                elif not starts and self.partial:
                    self.partial += part
                    if ends:
                        self.deliver(self.partial)
                        self.metrics["rx_sdus"] += 1
                        self.partial = b""
                elif starts and self.partial:
                    # loss in the middle: drop stale partial
                    self.partial = b""
                    if ends:
                        self.deliver(part)
                        self.metrics["rx_sdus"] += 1
                    else:
                        self.partial = part
            self.vr_ur = (self.vr_ur + 1) % self.sn_mod

    def needs_tick(self) -> bool:
        return bool(self.rx)

    def timer_tick(self):
        # gap detection: skip over losses after t_reordering
        if self.rx and self.vr_ur not in self.rx:
            self.t_reord += 1
            if self.t_reord >= self.t_reordering:
                self.t_reord = 0
                self.partial = b""
                self.vr_ur = min(self.rx.keys())
                self._reassemble()
        else:
            self.t_reord = 0


# ---------------------------------------------------------------- AM

class RlcAm:
    """AM with 10-bit SN: ARQ via status PDUs, retransmission, polling."""

    D_DATA, D_STATUS = 1, 0

    def __init__(self, deliver, poll_pdu: int = 4, t_poll_retx: int = 35,
                 max_retx: int = 16, on_max_retx=None):
        self.deliver = deliver
        self.tx_q = collections.deque()
        self.tx_sn = 0
        self.vt_a = 0  # oldest unacked SN (modular window base)
        self.tx_window = {}  # sn -> payload (unacked)
        self.retx_q = collections.deque()
        self.pdus_since_poll = 0
        self.poll_pdu = poll_pdu
        self.t_poll_retx = t_poll_retx
        self._poll_timer = 0
        self.rx = {}
        self.vr_r = 0
        self.status_requested = False
        self.max_retx = max_retx
        self.retx_count = collections.Counter()
        self.on_max_retx = on_max_retx
        self.partial = b""
        self._carry_start = False
        self.metrics = collections.Counter()

    def _dist(self, sn: int) -> int:
        """Modular distance of sn from the window base vt_a."""
        return (sn - self.vt_a) % MOD_AM

    # -- transmit side --
    def write_sdu(self, sdu: bytes):
        self.tx_q.append(bytes(sdu))

    def has_data(self):
        return bool(self.tx_q or self.retx_q or self.status_requested)

    def read_pdu(self, nof_bytes: int):
        if self.status_requested:
            self.status_requested = False
            return self._build_status()
        if self.retx_q:
            sn = self.retx_q.popleft()
            if sn in self.tx_window:
                self.retx_count[sn] += 1
                self.metrics["retx_pdus"] += 1
                if self.retx_count[sn] > self.max_retx and self.on_max_retx:
                    self.on_max_retx()
                return self.tx_window[sn]
        if not self.tx_q or nof_bytes < 5:
            return None
        fi_start = 1 if self._carry_start else 0
        fi_end = 0
        segs, lis = [], []
        room = nof_bytes - 2
        while self.tx_q and room > 0:
            cost_li = 2 if segs else 0
            sdu = self.tx_q[0]
            if len(sdu) + cost_li <= room:
                if segs:
                    lis.append(len(segs[-1]))
                    room -= 2
                segs.append(self.tx_q.popleft())
                room -= len(segs[-1])
            else:
                take = room - cost_li
                if take <= 0:
                    break
                if segs:
                    lis.append(len(segs[-1]))
                segs.append(sdu[:take])
                self.tx_q[0] = sdu[take:]
                fi_end = 1
                break
        if not segs:
            return None
        self._carry_start = fi_end == 1
        payload = b"".join(segs)
        poll = 0
        self.pdus_since_poll += 1
        if self.pdus_since_poll >= self.poll_pdu or not self.tx_q:
            poll = 1
            self.pdus_since_poll = 0
        # AM fixed header: D/C(1) RF(1) P(1) FI(2) E(1) SN(10) over 2 bytes
        hdr_bits = (self.D_DATA << 7) | (poll << 5) | (fi_start << 4) | (fi_end << 3)
        pdu = _pack_li_headers(hdr_bits, self.tx_sn, lis, payload)
        self.tx_window[self.tx_sn] = pdu
        self.tx_sn = (self.tx_sn + 1) % MOD_AM
        self.metrics["tx_pdus"] += 1
        return pdu

    MAX_NACKS = 16

    def _build_status(self) -> bytes:
        """STATUS PDU: [D/C=0][ACK_SN(2B)][n_nack(1B)][NACK_SN(2B)...].

        If the NACK list must be truncated, ACK_SN is lowered to the first
        unreported missing SN so the transmitter never falsely acks a gap
        (36.322 status triggering with window limits)."""
        missing = sorted(self._missing_sns())
        if len(missing) > self.MAX_NACKS:
            nacks = missing[: self.MAX_NACKS]
            ack_sn = missing[self.MAX_NACKS]
        else:
            nacks = missing
            ack_sn = self._highest_expected()
        out = (
            bytes([0x00])
            + struct.pack("!H", ack_sn)
            + bytes([len(nacks)])
            + b"".join(struct.pack("!H", sn) for sn in nacks)
        )
        self.metrics["tx_status"] += 1
        return out

    def _rx_dist(self, sn: int) -> int:
        return (sn - self.vr_r) % MOD_AM

    def _highest_expected(self):
        """SN after the highest received, in modular order from vr_r."""
        if not self.rx:
            return self.vr_r
        hi = max(self.rx.keys(), key=self._rx_dist)
        return (hi + 1) % MOD_AM

    def _missing_sns(self):
        if not self.rx:
            return []
        span = self._rx_dist(max(self.rx.keys(), key=self._rx_dist))
        return [(self.vr_r + i) % MOD_AM for i in range(span)
                if (self.vr_r + i) % MOD_AM not in self.rx]

    # -- receive side --
    def write_pdu(self, pdu: bytes):
        if not pdu:
            return
        if (pdu[0] >> 7) == self.D_STATUS:
            self._handle_status(pdu)
            return
        b0, sn, lis, payload = _unpack_li_headers(pdu)
        poll = (b0 >> 5) & 1
        self.metrics["rx_pdus"] += 1
        # receive window: PDUs modularly behind vr_r are duplicates of
        # already-delivered data — acknowledge (via status) but don't store
        if self._rx_dist(sn) < MOD_AM // 2:
            self.rx[sn] = (b0, lis, payload)
        else:
            self.metrics["rx_dup"] += 1
            self.status_requested = True
        if poll:
            self.status_requested = True
        self._deliver_in_order()

    def _deliver_in_order(self):
        while self.vr_r in self.rx:
            b0, lis, payload = self.rx.pop(self.vr_r)
            fi_start = (b0 >> 4) & 1
            fi_end = (b0 >> 3) & 1
            pos = 0
            parts = []
            for li in lis:
                parts.append(payload[pos : pos + li])
                pos += li
            parts.append(payload[pos:])
            for i, part in enumerate(parts):
                first, last = i == 0, i == len(parts) - 1
                is_start = not (first and fi_start)
                is_end = not (last and fi_end)
                if is_start:
                    self.partial = b""
                self.partial += part
                if is_end:
                    self.deliver(self.partial)
                    self.metrics["rx_sdus"] += 1
                    self.partial = b""
            self.vr_r = (self.vr_r + 1) % MOD_AM

    def _handle_status(self, pdu: bytes):
        ack_sn = struct.unpack("!H", pdu[1:3])[0]
        n_nack = pdu[3]
        nacks = set(struct.unpack("!H", pdu[4 + 2 * i : 6 + 2 * i])[0]
                    for i in range(n_nack))
        self.metrics["rx_status"] += 1
        self._poll_timer = 0
        # ack everything in [vt_a, ack_sn) (modular) except nacked
        ack_dist = self._dist(ack_sn)
        for sn in list(self.tx_window.keys()):
            if self._dist(sn) < ack_dist and sn not in nacks:
                del self.tx_window[sn]
                self.retx_count.pop(sn, None)
        for sn in nacks:
            if sn in self.tx_window and sn not in self.retx_q:
                self.retx_q.append(sn)
        # advance the window base to the oldest unacked
        if self.tx_window:
            self.vt_a = min(self.tx_window.keys(), key=self._dist)
        else:
            self.vt_a = self.tx_sn

    def needs_tick(self) -> bool:
        """Timer work is only possible with rx state or unacked data —
        event-driven tickers skip fully idle entities."""
        return bool(self.rx or self.tx_window)

    def timer_tick(self):
        """Returns truthy when timer work CREATED pending data (a status
        trigger or poll retransmission) — event-driven schedulers use this
        to re-arm their per-UE pending hints."""
        # fast path: a fully idle entity (no rx state, nothing unacked) has
        # no timer work — this is every idle UE's bearer every TTI at
        # deployment scale
        if not self.rx and not self.tx_window:
            self._poll_timer = 0
            return False
        woke = False
        # reordering: if gaps persist, request nothing here (receiver-driven
        # status comes from polls); a t_reordering-based status trigger:
        if self._missing_sns():
            self.status_requested = True
            woke = True
        # t-PollRetransmit (36.322): unacked data with no status feedback ->
        # retransmit the oldest unacked PDU with a fresh poll
        if self.tx_window and not self.retx_q:
            self._poll_timer += 1
            if self._poll_timer >= self.t_poll_retx:
                self._poll_timer = 0
                oldest = min(self.tx_window.keys(), key=self._dist)
                self.retx_q.append(oldest)
                self.metrics["poll_retx"] += 1
                woke = True
        else:
            self._poll_timer = 0
        return woke
