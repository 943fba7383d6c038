"""PRACH preamble generation + detection."""

import jax
import numpy as np

from srslte_emane_tpu.ops import channel, cplx
from srslte_emane_tpu.phch import prach


def test_preamble_unit_power_and_distinct():
    tbl = prach.preamble_freq_table(0, 1)
    # ZC freq domain: |X[k]|^2 == N_zc
    np.testing.assert_allclose(np.abs(tbl[0]) ** 2, prach.N_ZC, rtol=1e-3)
    assert not np.allclose(tbl[0], tbl[1])


def test_detect_clean():
    idx = np.array([0, 5, 17, 63])
    p = prach.gen(idx, 0, 1)
    det, metric, toff = prach.detect(p, 0, 1)
    det = np.asarray(det).copy()
    assert det[np.arange(4), idx].all()
    # no cross-detections
    det[np.arange(4), idx] = False
    assert not det.any()
    assert (np.asarray(toff)[np.arange(4), idx] == 0).all()


def test_detect_noisy_with_delay():
    rng = np.random.default_rng(1)
    idx = np.array([3, 40])
    p = np.asarray(prach.gen(idx, 6, 2))
    # apply integer delay d=5 (phase ramp in freq) + AWGN
    d = 5
    k = np.arange(prach.N_ZC)
    ramp = np.exp(-1j * 2 * np.pi * k * d / prach.N_ZC)
    pc = cplx.to_numpy(p) * ramp
    pc = pc + (rng.normal(0, 0.7, pc.shape) + 1j * rng.normal(0, 0.7, pc.shape))
    rx = cplx.from_numpy(pc.astype(np.complex64))
    det, metric, toff = prach.detect(rx, 6, 2, threshold=8.0)
    det = np.asarray(det).copy()
    assert det[np.arange(2), idx].all()
    assert (np.asarray(toff)[np.arange(2), idx] == d).all()
    det[np.arange(2), idx] = False
    assert not det.any()


def test_prach_restricted_set_high_speed():
    """Restricted set type A: shift derivation and detection round trip."""
    from srslte_emane_tpu.phch import prach

    pairs, n_cs = prach.shift_list(22, 3, hs=True)
    assert len(pairs) == 64 and n_cs == prach.NCS_RESTRICTED[3]
    # restricted shifts avoid the +-d_u Doppler images: for every (u, cv)
    # the windows at cv, cv+du, cv-du (mod Nzc) never collide across
    # preambles of the same root
    from collections import defaultdict

    by_root = defaultdict(list)
    for u, cv in pairs:
        by_root[u].append(cv)
    for u, cvs in by_root.items():
        du = prach._d_u(u)
        occupied = set()
        for cv in cvs:
            for img in (cv, (cv + du) % prach.N_ZC, (cv - du) % prach.N_ZC):
                window = {(img + k) % prach.N_ZC for k in range(n_cs)}
                assert not (window & occupied), (u, cv, du)
            occupied |= {(cv + k) % prach.N_ZC for k in range(n_cs)}
    # detection round trip
    idx = np.array([0, 17, 40, 63])
    tx = prach.gen(idx, root_seq_idx=22, zczc=3, hs=True)
    import jax

    rx = channel.awgn(jax.random.PRNGKey(0), tx, 10.0)
    det, metric, _ = prach.detect(rx, root_seq_idx=22, zczc=3, hs=True)
    det = np.asarray(det)
    for b, p in enumerate(idx):
        assert det[b, p], (b, p, np.asarray(metric)[b, p])


def test_prach_waveform_two_stage_dft_roundtrip():
    """Time-domain PRACH at the 1.25 kHz numerology: synthesis and analysis
    via the two-stage CT DFT are mutually inverse, and detection works on
    the waveform path."""
    import jax

    from srslte_emane_tpu.phch import prach

    idx = np.array([3, 21, 40])
    t = prach.gen_waveform(idx, root_seq_idx=0, zczc=1)
    assert t.shape == (3, prach.N_CP_F0 + prach.N_SEQ, 2)
    # CP is a true cyclic prefix
    tt = np.asarray(t)
    np.testing.assert_allclose(tt[:, :prach.N_CP_F0],
                               tt[:, prach.N_SEQ:], atol=1e-4)
    rx = tt + np.random.default_rng(0).normal(0, 0.002, tt.shape).astype(np.float32)
    freq = prach.rx_waveform_to_freq(jnp.asarray(rx))
    # analysis inverts synthesis (scale-normalized)
    ref = np.asarray(prach.gen(idx, 0, 1))
    got = np.asarray(freq)
    scale = np.abs(got).mean() / np.abs(ref).mean()
    np.testing.assert_allclose(got / scale, ref, atol=0.05)
    det, metric, _ = prach.detect(freq, root_seq_idx=0, zczc=1)
    det = np.asarray(det)
    for b, p in enumerate(idx):
        assert det[b, p], (b, p)


def test_prach_waveform_all_formats():
    """Formats 0-4 waveform synthesis + detection (prach.c:235-266): each
    format's CP length and repetition count are honored, the CP is a true
    cyclic prefix of the (repeated) sequence, and the eNB detector recovers
    the transmitted preamble with a timing offset from the waveform."""
    from srslte_emane_tpu.phch import prach

    rng = np.random.default_rng(1)
    idx = np.array([5, 17])
    delay = 64  # 30.72 Msps samples
    for fmt in range(5):
        t = np.asarray(prach.gen_waveform(idx, root_seq_idx=2, zczc=1,
                                          fmt=fmt))
        n_cp, reps = prach.FORMAT_CP[fmt], prach.FORMAT_REPS[fmt]
        n_seq = prach.N_SEQ_F4 if fmt == 4 else prach.N_SEQ
        assert t.shape == (2, prach.waveform_len(fmt), 2), fmt
        # true cyclic prefix of the repeated sequence
        np.testing.assert_allclose(
            t[:, :n_cp], t[:, n_cp + reps * n_seq - n_cp : n_cp + reps * n_seq],
            atol=1e-4, err_msg=f"fmt {fmt}")
        # formats 2/3 really repeat the base sequence
        if reps == 2:
            np.testing.assert_allclose(t[:, n_cp : n_cp + n_seq],
                                       t[:, n_cp + n_seq : n_cp + 2 * n_seq],
                                       atol=1e-4)
        # delayed + noisy arrival still detects (delay < CP for all formats)
        rx = np.zeros_like(t)
        rx[:, delay:] = t[:, : t.shape[1] - delay]
        rx = rx + rng.normal(0, 0.02, rx.shape).astype(np.float32)
        freq = prach.rx_waveform_to_freq(jnp.asarray(rx), fmt=fmt)
        det, metric, toff = prach.detect(freq, root_seq_idx=2, zczc=1, fmt=fmt)
        det = np.asarray(det)
        for b, p in enumerate(idx):
            assert det[b, p], (fmt, b, p, np.asarray(metric)[b, p])
        # timing offset maps back to ~the injected delay (ZC-sample units)
        nzc = prach.nzc_for(fmt)
        samp_per_zc = n_seq / nzc
        got_delay = np.asarray(toff)[np.arange(2), idx] * samp_per_zc
        assert np.all(np.abs(got_delay - delay) < 2.5 * samp_per_zc), (
            fmt, got_delay)


def test_prach_format4_sequence_level():
    """Format 4 (N_ZC=139, 7.5 kHz, TDD UpPTS): own logical-root table and
    N_cs set; 64 preambles distinct and detectable at the sequence level."""
    from srslte_emane_tpu.phch import prach

    pairs, n_cs = prach.shift_list(1, 2, fmt=4)
    assert len(pairs) == 64
    assert n_cs == prach.NCS_F4[2]
    x = prach.gen(np.arange(64), root_seq_idx=1, zczc=2, fmt=4)
    assert x.shape == (64, 139, 2)
    det, _, _ = prach.detect(x, root_seq_idx=1, zczc=2, fmt=4)
    det = np.asarray(det)
    assert det[np.arange(64), np.arange(64)].all()


import jax.numpy as jnp
