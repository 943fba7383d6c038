"""PLMN selection (rrc.cc plmn_search/plmn_select, 36.304 suitable-cell
criterion): a UE camped on a cell whose SIB1 advertises a foreign PLMN
bars that PCI and reselects to the best measured neighbor of its home
PLMN before attaching."""

import numpy as np

from srslte_emane_tpu.epc import hss as hss_mod, mme as mme_mod, spgw as spgw_mod
from srslte_emane_tpu.runtime import otabus, phy_adapter, sinr, ttiloop
from srslte_emane_tpu.stack import enb_stack, security, ue_stack


def _net(foreign_plmn: int, home_plmn: int, ue_hplmn: int):
    # node 0 = eNB A (pci 1, foreign PLMN, strongest); node 1 = eNB B
    # (pci 2, home PLMN); node 2 = UE, initially camped on A
    pl = np.array([[0, 100, 70], [100, 0, 80], [70, 80, 0]], np.float32)
    bus = otabus.OtaBus(sinr.Propagation(pathloss_db=pl),
                        node_ids=[0, 1, 2], n_prb=25)
    net = ttiloop.Network(bus)
    hss = hss_mod.Hss()
    mme = mme_mod.Mme(hss, spgw_mod.Spgw())
    enb_a = enb_stack.EnbStack(mme, enb_id=1, n_prb=25, pci=1,
                               plmn=foreign_plmn)
    enb_b = enb_stack.EnbStack(mme, enb_id=2, n_prb=25, pci=2,
                               plmn=home_plmn)
    # different carriers (freq_idx = EARFCN role): foreign operators do
    # not share a carrier, so the cells are independent SINR domains
    net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25,
                                      mac=enb_a, freq_idx=0))
    net.add(phy_adapter.EnbPhyAdapter(bus, 1, cell_id=2, n_prb=25,
                                      mac=enb_b, freq_idx=1))
    imsi, key = "001010000000001", bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
    ue = ue_stack.UeStack(
        ue_stack.Usim(imsi, key, security.milenage_opc(key, b"\x00" * 16)),
        hplmn=ue_hplmn)
    net.add(phy_adapter.UePhyAdapter(bus, 2, cell_id=1, n_prb=25, stack=ue))
    return net, ue, enb_a, enb_b


def test_foreign_plmn_cell_is_barred_and_home_cell_selected():
    net, ue, enb_a, enb_b = _net(foreign_plmn=9, home_plmn=1, ue_hplmn=1)
    net.run(600)
    assert ue.metrics["plmn_barred"] >= 1
    assert 1 in ue.forbidden_pcis
    assert ue.serving_pci == 2
    assert ue.emm_state == "REGISTERED"
    assert ue.crnti in enb_b.ues and ue.crnti not in enb_a.ues


def test_home_plmn_cell_attaches_normally():
    net, ue, enb_a, enb_b = _net(foreign_plmn=1, home_plmn=1, ue_hplmn=1)
    net.run(300)
    assert ue.metrics.get("plmn_barred", 0) == 0
    assert ue.serving_pci == 1 and ue.emm_state == "REGISTERED"
