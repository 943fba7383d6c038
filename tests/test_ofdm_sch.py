"""DFT-as-matmul, OFDM roundtrip, and transport-block codec."""

import numpy as np
import pytest

from srslte_emane_tpu.ops import cplx, dft, ofdm
from srslte_emane_tpu.phch import sch


@pytest.mark.parametrize("n", [12, 128, 300, 2048])
def test_dft_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = (rng.normal(size=(3, n)) + 1j * rng.normal(size=(3, n))).astype(np.complex64)
    got = cplx.to_numpy(dft.dft(cplx.from_numpy(x)))
    ref = dft.dft_host(x)
    np.testing.assert_allclose(got, ref, atol=2e-3 * np.sqrt(n))
    got_i = cplx.to_numpy(dft.idft(cplx.from_numpy(x)))
    ref_i = dft.dft_host(x, inverse=True)
    np.testing.assert_allclose(got_i, ref_i, atol=2e-3 * np.sqrt(n))


@pytest.mark.parametrize("n_prb", [6, 50])
def test_ofdm_roundtrip(n_prb):
    rng = np.random.default_rng(n_prb)
    nre = 12 * n_prb
    grid = rng.normal(size=(2, 14, nre, 2)).astype(np.float32)
    t = ofdm.modulate(grid, n_prb)
    assert t.shape[-2] == ofdm.params(n_prb)["sf_len"]
    back = np.asarray(ofdm.demodulate(t, n_prb))
    # bf16 DFT inputs: worst-case element error ~1.5% (RMS -52 dB)
    np.testing.assert_allclose(back, grid, atol=3e-2)


def test_ofdm_subframe_lengths():
    assert ofdm.params(6)["sf_len"] == 1920
    assert ofdm.params(100)["sf_len"] == 30720
    assert ofdm.params(6)["cp0"] == 10 and ofdm.params(6)["cp"] == 9


@pytest.mark.parametrize("tbs,qm", [(152, 2), (1800, 4), (20000, 6)])
def test_sch_roundtrip(tbs, qm):
    cfg = sch.SchConfig(tbs=tbs, G=(-(-3 * (tbs + 100) // qm)) * qm, Qm=qm, Nl=1)
    rng = np.random.default_rng(tbs)
    B = 2
    payload = rng.integers(0, 2, size=(B, tbs), dtype=np.int8)
    cw = np.asarray(sch.encode_tb(payload, cfg))
    assert cw.shape == (B, cfg.G)
    llrs = (1.0 - 2.0 * cw).astype(np.float32) * 4
    out, ok, _, _ = sch.decode_tb(llrs, cfg)
    assert bool(np.all(np.asarray(ok)))
    np.testing.assert_array_equal(np.asarray(out), payload)


def test_sch_harq_retransmission():
    """First TX at rv0 heavily punctured + noisy fails; rv2 retransmission
    soft-combines in the persistent softbuffer and succeeds."""
    tbs, qm = 6712, 4  # two code blocks
    G = int(tbs * 1.05 // qm) * qm
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 2, size=(1, tbs), dtype=np.int8)
    snr_db = 1.5
    sigma = 10 ** (-snr_db / 20)
    soft = None
    oks = []
    for rv in (0, 2):
        cfg = sch.SchConfig(tbs=tbs, G=G, Qm=qm, Nl=1, rv=rv)
        cw = np.asarray(sch.encode_tb(payload, cfg))
        rx = (1 - 2.0 * cw) + rng.normal(0, sigma, cw.shape)
        llr = (rx * 2 / sigma**2).astype(np.float32)
        out, ok, soft, _ = sch.decode_tb(llr, cfg, softbuf=soft)
        oks.append(bool(np.asarray(ok)[0]))
    assert oks[-1]
    np.testing.assert_array_equal(np.asarray(out), payload)
