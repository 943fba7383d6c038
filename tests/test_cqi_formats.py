"""CQI report formats (cqi.c all four) + aperiodic CQI on PUSCH e2e.

Reference: lib/src/phy/phch/cqi.c pack/unpack per 36.212 Tables
5.2.2.6.2-1/-2 (HL subband), 5.2.2.6.3-1 (UE subband), 5.2.3.3.1-1/-2
(periodic wideband/subband); scheduler_ue.cc DCI-0 CSI request."""

import numpy as np

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.epc import spgw as spgw_mod
from srslte_emane_tpu.phch import uci


def test_wideband_format2_layouts():
    # rank 1, 2 ports: 4 + 2-bit PMI
    b = uci.pack_cqi_wideband(9, pmi=3)
    assert len(b) == 6
    assert uci.unpack_cqi_wideband(b, has_pmi=True) == dict(cqi=9, pmi=3)
    # rank 2, 2 ports: 4 + 3-bit spatial diff + 1-bit PMI
    b = uci.pack_cqi_wideband(12, pmi=1, rank2=True, spatial_diff=5)
    assert len(b) == 8
    out = uci.unpack_cqi_wideband(b, has_pmi=True, rank2=True)
    assert out == dict(cqi=12, spatial_diff_cqi=5, pmi=1)
    # rank 2, 4 ports: 4 + 3 + 4-bit PMI
    b = uci.pack_cqi_wideband(7, pmi=11, rank2=True, four_ports=True,
                              spatial_diff=2)
    assert len(b) == 11
    out = uci.unpack_cqi_wideband(b, has_pmi=True, rank2=True,
                                  four_ports=True)
    assert out == dict(cqi=7, spatial_diff_cqi=2, pmi=11)


def test_format2_subband_and_ue_subband():
    b = uci.pack_cqi_format2_subband(13, 2, label_2_bits=True)
    assert len(b) == 6
    assert uci.unpack_cqi_format2_subband(b, True) == dict(
        subband_cqi=13, subband_label=2)
    b = uci.pack_cqi_format2_subband(4, 1, label_2_bits=False)
    assert len(b) == 5
    # aperiodic UE-selected subband: 4 + 2 + L position bits
    for n_prb in (15, 50, 100):
        L = uci.cqi_ue_subband_label_bits(n_prb)
        b = uci.pack_cqi_ue_subband(10, 3, position=(1 << L) - 1, n_prb=n_prb)
        assert len(b) == 6 + L
        out = uci.unpack_cqi_ue_subband(b, n_prb)
        assert out == dict(wideband_cqi=10, subband_diff_cqi=3,
                           position=(1 << L) - 1)


def test_hl_subband_rank2_with_pmi():
    n_prb = 50
    n_sb = uci.cqi_hl_subband_size(n_prb)
    d0 = [i % 4 for i in range(n_sb)]
    d1 = [(i + 1) % 4 for i in range(n_sb)]
    b = uci.pack_cqi_hl_subband(11, d0, n_prb, cw1=(8, d1), pmi=1)
    assert len(b) == 2 * (4 + 2 * n_sb) + 1  # 1-bit PMI for rank>1, 2 ports
    out = uci.unpack_cqi_hl_subband(b, n_prb, rank2=True, has_pmi=True)
    assert out["wideband_cqi"] == 11 and out["subband_diff_cqi"] == d0
    assert out["wideband_cqi_cw1"] == 8 and out["subband_diff_cqi_cw1"] == d1
    assert out["pmi"] == 1


def test_aperiodic_cqi_on_pusch_e2e():
    """The eNB's DCI-0 CSI request makes the UE ship an aperiodic
    HL-subband report on its PUSCH; the scheduler stores the subband
    vector and counts the report."""
    sysd = netsim.build_network(2, 75.0, n_prb=50)
    net, enb, spgw = sysd["net"], sysd["enb"], sysd["spgw"]
    net.run(200)
    ues = sysd["ues"]
    assert all(u.emm_state == "REGISTERED" for u in ues)
    # UL traffic -> SR/BSR grants -> first grant carries the CSI request
    for u in ues:
        u.gw_send(spgw_mod.make_ipv4(u.ip_addr, "8.8.8.8", b"u" * 300))
    net.run(200)
    assert enb.metrics["aperiodic_cqi"] >= 2
    assert all(u.metrics["aperiodic_cqi_tx"] >= 1 for u in ues)
    n_sb = uci.cqi_hl_subband_size(50)
    for ctx in enb.ues.values():
        assert len(getattr(ctx, "sb_cqi", [])) == n_sb


def test_aperiodic_hl_subband_report_on_pusch_waveform():
    """An aperiodic HL-subband report (real 36.212 bit packing) rides the
    PUSCH UCI multiplexing through the full waveform and unpacks at the
    eNB (cqi.c aperiodic on UL-SCH + sch.c channel interleaver)."""
    import jax

    from srslte_emane_tpu.ops import channel, ofdm
    from srslte_emane_tpu.phch import grid as grid_mod, pusch, sch

    cell = grid_mod.CellConfig(n_prb=25, cell_id=42)
    sf_idx, rnti, rb_start, l_prb, qm = 2, 0x5A, 0, 8, 2
    n_prb_dl = 50
    n_sb = uci.cqi_hl_subband_size(n_prb_dl)
    diffs = [i % 4 for i in range(n_sb)]
    report = uci.pack_cqi_hl_subband(12, diffs, n_prb_dl)
    n_cqi = len(report)
    B = 2
    rng = np.random.default_rng(1)
    q_ack, q_ri, q_cqi, g_data = pusch.uci_dims(l_prb, qm, 0, 0, n_cqi)
    tbs = max(8, (int(g_data * 0.4) - 24) // 8 * 8)
    cfg = sch.SchConfig(tbs=tbs, G=g_data, Qm=qm, Nl=1)
    payload = rng.integers(0, 2, (B, tbs), dtype=np.int8)
    cqi_bits = np.tile(report, (B, 1)).astype(np.int8)
    g = pusch.encode(payload, cfg, cell, sf_idx, rnti, rb_start, l_prb,
                     uci=dict(ack=np.zeros((B, 0), np.int8),
                              ri=np.zeros((B, 0), np.int8), cqi=cqi_bits))
    t = ofdm.modulate(g, cell.n_prb)
    rx = channel.awgn(jax.random.PRNGKey(1), t, 10.0)
    rg = ofdm.demodulate(rx, cell.n_prb)
    out = pusch.decode(rg, cfg, cell, sf_idx, rnti, rb_start, l_prb,
                       uci_dims_in=(q_ack, q_ri, q_cqi, 0, 0, n_cqi))
    assert np.asarray(out["ok"]).all()
    got = uci.unpack_cqi_hl_subband(np.asarray(out["cqi"])[0], n_prb_dl)
    assert got["wideband_cqi"] == 12 and got["subband_diff_cqi"] == diffs


def test_periodic_subband_report_on_pucch_f2_waveform():
    """A periodic UE-selected subband report (format2_subband layout)
    rides PUCCH format 2 through the waveform and unpacks at the eNB."""
    import jax

    from srslte_emane_tpu.ops import channel, cplx, ofdm
    from srslte_emane_tpu.phch import grid as grid_mod, pucch

    cell = grid_mod.CellConfig(n_prb=6, cell_id=1, cfi=2)
    report = uci.pack_cqi_format2_subband(9, 2, label_2_bits=True)
    bits = np.tile(report, (2, 1)).astype(np.int8)
    g = cplx.zeros((2, grid_mod.N_SYM, cell.nre))
    g = pucch.encode_f2(bits, cell, 4, n_pucch2=3, grid=g)
    t = ofdm.modulate(g, cell.n_prb)
    rx = channel.awgn(jax.random.PRNGKey(3), t, 10.0)
    rg = ofdm.demodulate(rx, cell.n_prb)
    out, _ = pucch.decode_f2(rg, cell, 4, n_pucch2=3, n_bits=len(report))
    got = uci.unpack_cqi_format2_subband(np.asarray(out)[0], True)
    assert got == dict(subband_cqi=9, subband_label=2)
