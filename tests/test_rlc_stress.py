"""RLC AM randomized stress: loss, reordering, duplication (the
rlc_stress_test.cc role — SURVEY §4)."""

import numpy as np

from srslte_emane_tpu.stack import rlc


def _pump(tx, rx, rng, n_ttis, drop_p, dup_p, reorder_p):
    """Run TTIs moving PDUs tx->rx with random impairments; rx status PDUs
    travel back losslessly-ish (also impaired)."""
    delayed = []
    for _ in range(n_ttis):
        # forward direction
        pdus = []
        for _ in range(3):
            p = tx.read_pdu(120)
            if p is None:
                break
            pdus.append(p)
        # release any delayed (reordered) PDUs from earlier
        pdus.extend(delayed)
        delayed = []
        for p in pdus:
            r = rng.random()
            if r < drop_p:
                continue
            if r < drop_p + dup_p:
                rx.write_pdu(p)
                rx.write_pdu(p)
            elif r < drop_p + dup_p + reorder_p:
                delayed.append(p)
            else:
                rx.write_pdu(p)
        # reverse direction (status reports)
        for _ in range(2):
            q = rx.read_pdu(120)
            if q is None:
                break
            if rng.random() > drop_p:
                tx.write_pdu(q)
        tx.timer_tick()
        rx.timer_tick()


def test_rlc_am_stress_lossy_reordering_duplicating_channel():
    rng = np.random.default_rng(7)
    delivered = []
    tx = rlc.RlcAm(deliver=lambda s: None)
    rx = rlc.RlcAm(deliver=delivered.append)
    sdus = [bytes([i % 256]) * (20 + (i * 13) % 60) for i in range(120)]
    for s in sdus:
        tx.write_sdu(s)
    _pump(tx, rx, rng, 4000, drop_p=0.15, dup_p=0.1, reorder_p=0.1)
    # lossless in-order delivery despite the hostile channel
    assert delivered == sdus, (len(delivered), len(sdus))


def test_rlc_um_stress_tolerates_loss_without_stall():
    """UM has no ARQ: losses drop SDUs but the entity keeps advancing."""
    rng = np.random.default_rng(9)
    delivered = []
    tx = rlc.RlcUm(deliver=lambda s: None)
    rx = rlc.RlcUm(deliver=delivered.append)
    sdus = [bytes([i % 256]) * 40 for i in range(200)]
    for s in sdus:
        tx.write_sdu(s)
    for _ in range(1500):
        p = tx.read_pdu(100)
        if p is not None and rng.random() > 0.2:
            rx.write_pdu(p)
        tx.timer_tick()
        rx.timer_tick()
    assert len(delivered) >= 100  # most got through
    # everything delivered is genuine and uncorrupted
    assert set(delivered) <= set(sdus)
