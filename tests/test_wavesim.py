"""Waveform-mode data plane: attached-UE DL data through the real PHY
(PDCCH DCI + PDSCH + OFDM + channel), hybrid with the message-level control
plane."""

import numpy as np

from srslte_emane_tpu.phch import grid as grid_mod
from srslte_emane_tpu.runtime import wavesim


def test_waveform_dataplane_delivery_and_loss():
    cell = grid_mod.CellConfig(n_prb=15, cell_id=1, cfi=1)
    dp = wavesim.WaveformDataPlane(cell)
    dp.add_ue(0x46, prb_mask=(1,) * 8 + (0,) * 7, qm=4)
    pdus = [bytes([i]) * (20 + 3 * i) for i in range(4)]
    # strong link: everything delivered bit-exact through the full PHY
    out = dp.send(0x46, pdus, pathloss_db=100.0)
    for (got, snr), sent in zip(out, pdus):
        assert got == sent
        assert snr > 20.0
    # hopeless link: CRC fails (SNR ~ -16 dB)
    out = dp.send(0x46, pdus[:2], pathloss_db=150.0)
    assert all(got is None for got, _ in out)
    assert dp.metrics["crc_ok"] == 4 and dp.metrics["crc_fail"] == 2


def test_waveform_dataplane_two_ues_separate_slots():
    cell = grid_mod.CellConfig(n_prb=15, cell_id=2, cfi=1)
    dp = wavesim.WaveformDataPlane(cell)
    dp.add_ue(0x46, prb_mask=(1,) * 7 + (0,) * 8, qm=4, cce_start=0)
    dp.add_ue(0x47, prb_mask=(0,) * 8 + (1,) * 7, qm=2, cce_start=0)
    a = dp.send(0x46, [b"ue-a-packet" * 3], pathloss_db=95.0)
    b = dp.send(0x47, [b"ue-b-packet" * 3], pathloss_db=105.0)
    assert a[0][0] == b"ue-a-packet" * 3
    assert b[0][0] == b"ue-b-packet" * 3


def test_waveform_whole_tti_multi_ue():
    """send_tti: ONE compiled graph carries every attached UE's burst in
    shared multi-grant subframes (sf_worker.cc serving N grants per TTI);
    per-UE pathloss is data, CCEs come from each UE's real search space."""
    from srslte_emane_tpu.phch import pdcch

    cell = grid_mod.CellConfig(n_prb=15, cell_id=3, cfi=2)
    dp = wavesim.WaveformDataPlane(cell)
    rntis = [0x46, 0x47, 0x48, 0x49]
    alloc = pdcch.allocate_cces(cell, rntis, sf_idx=1)
    assert set(alloc) == set(rntis)  # all four placed without collision
    for u, r in enumerate(rntis):
        l, start = alloc[r]
        dp.add_ue(r, prb_mask=tuple(int(i // 3 == u) for i in range(15)),
                  qm=4, l_aggr=l, cce_start=start)
    pdus = {r: [bytes([r & 0xFF]) * 12, bytes([u]) * 8]
            for u, r in enumerate(rntis)}
    pl = {r: 95.0 + 5.0 * u for u, r in enumerate(rntis)}
    out = dp.send_tti(pdus, pl)
    for r in rntis:
        assert [g for g, _ in out[r]] == pdus[r]
    # one graph in the TTI cache regardless of UE count
    assert dp._tti_fn.cache_info().currsize == 1
    # deep fade on one UE only: its PDUs fail, others still deliver
    pl[0x49] = 150.0
    out = dp.send_tti(pdus, pl)
    assert all(g is None for g, _ in out[0x49])
    assert [g for g, _ in out[0x46]] == pdus[0x46]


def test_netsim_waveform_mode():
    """netsim --waveform: attached UEs' DL bursts ride the device PHY and
    the summary reports per-UE delivery + measured SNR."""
    from srslte_emane_tpu.apps import netsim

    summary = netsim.main(["--ues", "1", "--ttis", "150", "--prb", "15",
                           "--pathloss", "75", "--waveform"])
    assert summary["attached"] == 1
    wf = summary["waveform"]
    assert len(wf) == 1
    assert wf[0]["delivered"] == 4
    assert wf[0]["snr_db"] > 20


def test_mimo_tm3_data_plane():
    """TM3 2x2 waveform DL: both codewords of each subframe deliver their
    PDU through the full pipeline; deep fade fails CRC."""
    cell = grid_mod.CellConfig(n_prb=25, cell_id=5, n_ports=2, cfi=1)
    dp = wavesim.MimoDataPlane(cell)
    dp.add_ue(0x50, (1,) * 25, qm=4)
    pdus = [bytes([i]) * 150 for i in range(6)]
    out = dp.send(0x50, pdus, pathloss_db=95.0)
    assert all(o == p for o, p in zip(out, pdus)), dp.metrics
    out2 = dp.send(0x50, pdus[:2], pathloss_db=135.0)
    assert all(o is None for o in out2)


def test_ulsch_plane_pusch_with_aperiodic_cqi():
    """UL-SCH waveform plane: PUSCH data + the 36.212 aperiodic HL-subband
    CQI report multiplexed and both recovered at the eNB (pusch.c UCI mux
    + cqi.c aperiodic path through the device)."""
    from srslte_emane_tpu.phch import grid as grid_mod
    from srslte_emane_tpu.runtime import wavesim

    cell = grid_mod.CellConfig(n_prb=25, cell_id=1)
    up = wavesim.UlSchPlane(cell)
    up.add_ue(0x46, 0, 8, qm=2)
    up.add_ue(0x47, 8, 8, qm=2)
    out = up.step({0x46: (b"hello-ul-world!!", 9),
                   0x47: (b"second-ue-pusch!", 12)},
                  {0x46: 100.0, 0x47: 105.0})
    assert out[0x46] == (b"hello-ul-world!!", True, 9)
    assert out[0x47] == (b"second-ue-pusch!", True, 12)
    assert up.metrics["cqi_rx"] == 2
    # cell-edge pathloss: CRC fails cleanly, no CQI claimed
    far = up.step({0x46: (b"hello-ul-world!!", 9)}, {0x46: 145.0})
    assert far[0x46] == (None, False, None)
