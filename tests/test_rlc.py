"""RLC TM/UM/AM: segmentation, reassembly, ARQ; randomized stress test
(the rlc_stress_test.cc equivalent)."""

import numpy as np
import pytest

from srslte_emane_tpu.stack import rlc


def test_tm_passthrough():
    out = []
    e = rlc.RlcTm(out.append)
    e.write_sdu(b"abc")
    pdu = e.read_pdu(100)
    e2 = rlc.RlcTm(out.append)
    e2.write_pdu(pdu)
    assert out == [b"abc"]


def test_um_concat_and_segment():
    rng = np.random.default_rng(0)
    out = []
    tx = rlc.RlcUm(lambda s: None)
    rx = rlc.RlcUm(out.append)
    sdus = [bytes(rng.integers(0, 256, size=n, dtype=np.uint8)) for n in (10, 300, 5, 1200, 70)]
    for s in sdus:
        tx.write_sdu(s)
    while tx.has_data():
        pdu = tx.read_pdu(151)
        assert pdu is not None and len(pdu) <= 151
        rx.write_pdu(pdu)
    assert out == sdus


def test_um_tolerates_loss():
    rng = np.random.default_rng(1)
    out = []
    tx = rlc.RlcUm(lambda s: None)
    rx = rlc.RlcUm(out.append, t_reordering=3)
    sdus = [bytes([i]) * 50 for i in range(20)]
    for s in sdus:
        tx.write_sdu(s)
    i = 0
    while tx.has_data():
        pdu = tx.read_pdu(80)
        i += 1
        if i % 5 == 0:
            continue  # drop
        rx.write_pdu(pdu)
        for _ in range(4):
            rx.timer_tick()
    # most SDUs delivered despite losses, order preserved
    assert len(out) >= 12
    idx = [sdus.index(s) for s in out]
    assert idx == sorted(idx)


def test_am_reliable_under_loss_and_reorder():
    rng = np.random.default_rng(2)
    a_out, b_out = [], []
    a = rlc.RlcAm(a_out.append, poll_pdu=3)
    b = rlc.RlcAm(b_out.append, poll_pdu=3)
    sdus = [bytes(rng.integers(0, 256, size=int(n), dtype=np.uint8))
            for n in rng.integers(1, 800, size=60)]
    for s in sdus:
        a.write_sdu(s)
    # unreliable channel: 15% loss, occasional reorder, bidirectional
    in_flight_ab, in_flight_ba = [], []
    for step in range(4000):
        pdu = a.read_pdu(120)
        if pdu is not None and rng.random() > 0.15:
            in_flight_ab.append(pdu)
        pdu = b.read_pdu(120)
        if pdu is not None and rng.random() > 0.15:
            in_flight_ba.append(pdu)
        if in_flight_ab and (rng.random() < 0.8 or len(in_flight_ab) > 3):
            k = 0 if rng.random() < 0.9 else rng.integers(0, len(in_flight_ab))
            b.write_pdu(in_flight_ab.pop(int(k)))
        if in_flight_ba:
            a.write_pdu(in_flight_ba.pop(0))
        a.timer_tick()
        b.timer_tick()
        if len(b_out) == len(sdus):
            break
    assert b_out == sdus, f"delivered {len(b_out)}/{len(sdus)}"


def test_am_max_retx_callback():
    flagged = []
    a = rlc.RlcAm(lambda s: None, poll_pdu=1, max_retx=4,
                  on_max_retx=lambda: flagged.append(1))
    a.write_sdu(b"x" * 10)
    a.read_pdu(100)
    # fake repeated NACKs: spec STATUS (ACK_SN=1, one plain NACK_SN=0)
    w = rlc._BitWriter()
    w.put(0, 1)   # D/C
    w.put(0, 3)   # CPT
    w.put(1, 10)  # ACK_SN
    w.put(1, 1)   # E1
    w.put(0, 10)  # NACK_SN
    w.put(0, 1)   # E1
    w.put(0, 1)   # E2
    status = w.to_bytes()
    for _ in range(8):
        a.write_pdu(status)
        a.read_pdu(100)
    assert flagged


def test_am_sn_wraparound():
    """SNs cross the 10-bit modulus under loss; delivery stays in order."""
    rng = np.random.default_rng(9)
    out = []
    a = rlc.RlcAm(lambda s: None, poll_pdu=3)
    b = rlc.RlcAm(out.append, poll_pdu=3)
    sdus = [bytes([i & 0xFF]) * 20 for i in range(1500)]  # > 1024 PDUs
    for s in sdus:
        a.write_sdu(s)
    for step in range(12000):
        pdu = a.read_pdu(60)
        if pdu is not None and rng.random() > 0.1:
            b.write_pdu(pdu)
        back = b.read_pdu(60)
        if back is not None:
            a.write_pdu(back)
        a.timer_tick()
        b.timer_tick()
        if len(out) == len(sdus):
            break
    assert out == sdus, f"delivered {len(out)}/{len(sdus)}"


def test_am_poll_retransmit_timer():
    """A lost final PDU (poll lost too) is recovered by t-PollRetransmit."""
    out = []
    a = rlc.RlcAm(lambda s: None, poll_pdu=10, t_poll_retx=5)
    b = rlc.RlcAm(out.append, poll_pdu=10)
    a.write_sdu(b"only-sdu")
    pdu = a.read_pdu(100)  # transmitted but LOST
    assert pdu is not None
    for _ in range(20):
        a.timer_tick()
        retx = a.read_pdu(100)
        if retx is not None:
            b.write_pdu(retx)
        back = b.read_pdu(100)
        if back is not None:
            a.write_pdu(back)
        b.timer_tick()
    assert out == [b"only-sdu"]
    assert not a.tx_window  # acked after recovery


def test_um_5bit_sn_mode():
    out = []
    tx = rlc.RlcUm(lambda s: None, sn_bits=5)
    rx = rlc.RlcUm(out.append, sn_bits=5)
    sdus = [bytes([i]) * 45 for i in range(64)]  # crosses the 5-bit wrap
    for s in sdus:
        tx.write_sdu(s)
    while tx.has_data():
        rx.write_pdu(tx.read_pdu(60))
    assert out == sdus
