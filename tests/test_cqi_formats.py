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
