"""Tier-2 golden tests against the reference's checked-in REAL IQ captures —
the pbch_file_test / pdsch_pdcch_file_test equivalents
(`lib/src/phy/phch/test/CMakeLists.txt:233-238`).  These prove bit-exact
interop of the whole downlink chain with waveforms produced by real/other
implementations, not just self-roundtrips."""

import os

import numpy as np
import pytest

from srslte_emane_tpu.ops import cplx, ofdm
from srslte_emane_tpu.phch import chest, dci, grid as grid_mod, pbch, pdcch, pdsch, ra, sch, sync
from srslte_emane_tpu.utils import iq_io

FIX = "/root/reference/lib/src/phy/phch/test"
pytestmark = pytest.mark.skipif(not os.path.isdir(FIX),
                                reason="reference fixtures not mounted")


def test_pbch_file():
    """pbch_file_test: cell 150, 6 PRB, 2 ports; known MIB payload."""
    x = iq_io.read_cf32(f"{FIX}/signal.1.92M.dat")
    cell = grid_mod.CellConfig(n_prb=6, cell_id=150, n_ports=2)
    g = ofdm.demodulate(cplx.from_numpy(x[None, :1920]), 6)
    ch0 = chest.estimate(g, cell, 0, port=0)
    ch1 = chest.estimate(g, cell, 0, port=1)
    mib, ports, off, ok = pbch.decode(g, ch0.ce, cell, ce_port1=ch1.ce)
    assert np.asarray(ok).all()
    assert int(np.asarray(ports)[0]) == 2
    expected = [0, 1, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    np.testing.assert_array_equal(np.asarray(mib)[0], expected)
    assert pbch.unpack_mib(np.asarray(mib)[0])["n_prb"] == 50


def test_cell_search_on_capture():
    """pss_file equivalent: sync finds cell 150 frame-aligned."""
    x = iq_io.read_cf32(f"{FIX}/signal.1.92M.dat")
    res = sync.cell_search(cplx.from_numpy(x[None, :3840]))
    assert int(res["cell_id"][0]) == 150
    assert int(res["sf_idx"][0]) == 0
    assert int(res["pss_pos"][0]) == sync.pss_symbol_start(6)


@pytest.mark.parametrize("sf_i,exp_mcs", [(5, 2), (2, 6)])
def test_sib_decode_from_amar_capture(sf_i, exp_mcs):
    """pdsch_pdcch_file_test: blind-search the SI-RNTI DCI and decode the SIB
    transport block (CRC24A) from the real capture (cell 1, cfi 3)."""
    x = iq_io.read_cf32(f"{FIX}/signal.1.92M.amar.dat")
    cell = grid_mod.CellConfig(n_prb=6, cell_id=1, n_ports=1, cfi=3)
    si_rnti = 0xFFFF
    g = ofdm.demodulate(cplx.from_numpy(x[None, sf_i * 1920:(sf_i + 1) * 1920]), 6)
    ch = chest.estimate(g, cell, sf_i)
    bits, ok, cands = pdcch.blind_search(g, ch.ce, cell, sf_i, si_rnti,
                                         dci.format0_1a_len(6))
    ok = np.asarray(ok)[0]
    assert ok.any(), "SI DCI not found"
    d = dci.unpack_dl(np.asarray(bits)[0, int(np.flatnonzero(ok)[0])], 6, "1A")
    assert d.mcs == exp_mcs
    tbs = ra.dl_tbs_ra_format1a_common(d.mcs, d.tpc)
    mask = ra.type2_to_prb_mask(d.rb_start, d.l_crbs, 6)
    n_re = grid_mod.nof_re(cell, sf_i, mask)
    cfg = sch.SchConfig(tbs=tbs, G=n_re * 2, Qm=2, Nl=1, rv=d.rv)
    out, okc, _, _ = pdsch.decode(g, cfg, cell, sf_i, si_rnti, mask)
    assert np.asarray(okc).all(), "SIB transport block CRC failed"


def test_pcfich_from_10mhz_capture():
    """pcfich_file_test: cell 150, 50 PRB, 2 ports (signal.10M.dat holds one
    slot; the control region lives in symbol 0)."""
    from srslte_emane_tpu.phch import pcfich

    x = iq_io.read_cf32(f"{FIX}/signal.10M.dat")
    sf_len = 15360
    buf = np.zeros(sf_len, np.complex64)
    buf[: len(x)] = x[:sf_len]
    cell = grid_mod.CellConfig(n_prb=50, cell_id=150, n_ports=2)
    g = ofdm.demodulate(cplx.from_numpy(buf[None]), 50)
    ch0 = chest.estimate(g, cell, 0, port=0)
    ch1 = chest.estimate(g, cell, 0, port=1)
    cfi, corr = pcfich.decode(g, ch0.ce, cell, 0, ce_port1=ch1.ce)
    corr = np.asarray(corr)[0]
    best = np.argsort(corr)
    # confident decode: winning codeword clearly separated
    assert corr[best[-1]] > 2.5 * abs(corr[best[-2]]), corr
    assert int(np.asarray(cfi)[0]) in (1, 2, 3)


def test_mib_from_amar_capture():
    x = iq_io.read_cf32(f"{FIX}/signal.1.92M.amar.dat")
    cell = grid_mod.CellConfig(n_prb=6, cell_id=1, n_ports=1)
    g = ofdm.demodulate(cplx.from_numpy(x[None, :1920]), 6)
    ch0 = chest.estimate(g, cell, 0, port=0)
    ch1 = chest.estimate(g, cell, 0, port=1)
    mib, ports, off, ok = pbch.decode(g, ch0.ce, cell, ce_port1=ch1.ce)
    assert np.asarray(ok).all()
    assert int(np.asarray(ports)[0]) == 1
    assert pbch.unpack_mib(np.asarray(mib)[0])["n_prb"] == 6


def test_pmch_from_capture():
    """pmch_file_test: decode the eMBMS transport block from the checked-in
    100-PRB MBSFN capture (MCS2, area 1, recorded at srsLTE's 23.04 Msps /
    1536-FFT reduced rate)."""
    from srslte_emane_tpu.phch import pmch

    x = iq_io.read_cf32(f"{FIX}/pmch_100prbs_MCS2_SR0.bin")
    n_prb, n_fft, area, sf_i = 100, 1536, 1, 1
    ctrl, mb = ofdm.demodulate_mbsfn(cplx.from_numpy(x[None]), n_prb, n_fft)
    n_re = pmch.nof_re(n_prb)
    tbs = ra.dl_tbs(2, n_prb)
    cfg = sch.SchConfig(tbs=tbs, G=n_re * 2, Qm=2, Nl=1)
    out, ok = pmch.decode(mb, cfg, n_prb, area, sf_i)
    assert np.asarray(ok).all(), "PMCH transport block CRC failed"
