"""Distributed OTA bus: eNB and UE in separate threads of control, frames
over TCP through the SINR hub — full attach completes."""

import threading

import numpy as np

from srslte_emane_tpu.epc import hss as hss_mod, mme as mme_mod, spgw as spgw_mod
from srslte_emane_tpu.runtime import distrib, phy_adapter, sinr
from srslte_emane_tpu.stack import enb_stack, security, ue_stack


def test_distributed_attach():
    pl = np.array([[0, 80], [80, 0]], np.float32)
    prop = sinr.Propagation(pathloss_db=pl)
    hub = distrib.OtaHub(prop, node_ids=[0, 1], n_prb=25).start()

    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    imsi, key = "001010000000001", bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi=imsi, key=key))

    enb_bus = distrib.RemoteBus("127.0.0.1", hub.port, 0)
    ue_bus = distrib.RemoteBus("127.0.0.1", hub.port, 1)
    enb = enb_stack.EnbStack(mme, enb_id=1, n_prb=25)
    enb_node = phy_adapter.EnbPhyAdapter(enb_bus, 0, cell_id=1, n_prb=25, mac=enb)
    ue = ue_stack.UeStack(ue_stack.Usim(imsi, key, security.milenage_opc(key, b"\x00" * 16)))
    ue_node = phy_adapter.UePhyAdapter(ue_bus, 1, cell_id=1, n_prb=25, stack=ue)

    # two node "processes" advancing on the hub's TTI barrier
    def run_node(node, bus, n):
        for _ in range(n):
            node.run_tti(bus.curr_tti)
            bus.step_tti()

    t1 = threading.Thread(target=run_node, args=(enb_node, enb_bus, 80))
    t2 = threading.Thread(target=run_node, args=(ue_node, ue_bus, 80))
    t1.start(); t2.start()
    t1.join(timeout=30); t2.join(timeout=30)
    try:
        assert ue.emm_state == "REGISTERED", (ue.emm_state, ue.rrc_state)
        assert mme.metrics["attach_ok"] == 1
    finally:
        enb_bus.close()
        ue_bus.close()
        hub.stop()


def test_native_hub_attach():
    """Same attach flow through the C++ ota_hub daemon: the TTI barrier and
    per-RB SINR run natively; payloads cross as opaque bytes."""
    if not distrib.native_hub_available():
        import pytest

        pytest.skip("native ota_hub not built (scripts/build_native.sh)")
    pl = np.array([[0, 80], [80, 0]], np.float32)
    prop = sinr.Propagation(pathloss_db=pl)
    hub = distrib.NativeHub(prop, n_nodes=2, n_prb=25)

    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    imsi, key = "001010000000001", bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi=imsi, key=key))

    enb_bus = distrib.NativeRemoteBus("127.0.0.1", hub.port, 0, n_prb=25)
    ue_bus = distrib.NativeRemoteBus("127.0.0.1", hub.port, 1, n_prb=25)
    enb = enb_stack.EnbStack(mme, enb_id=1, n_prb=25)
    enb_node = phy_adapter.EnbPhyAdapter(enb_bus, 0, cell_id=1, n_prb=25, mac=enb)
    ue = ue_stack.UeStack(ue_stack.Usim(imsi, key, security.milenage_opc(key, b"\x00" * 16)))
    ue_node = phy_adapter.UePhyAdapter(ue_bus, 1, cell_id=1, n_prb=25, stack=ue)

    def run_node(node, bus, n):
        for _ in range(n):
            node.run_tti(bus.curr_tti)
            bus.step_tti()

    t1 = threading.Thread(target=run_node, args=(enb_node, enb_bus, 120))
    t2 = threading.Thread(target=run_node, args=(ue_node, ue_bus, 120))
    t1.start(); t2.start()
    t1.join(timeout=30); t2.join(timeout=30)
    try:
        assert ue.emm_state == "REGISTERED", (ue.emm_state, ue.rrc_state)
        assert mme.metrics["attach_ok"] == 1
    finally:
        enb_bus.close()
        ue_bus.close()
        hub.stop()


def test_native_hub_node_crash_fails_fast():
    """A node dying without BYE must not hang the deployment: the hub tears
    down and the surviving node's step_tti raises ConnectionError."""
    if not distrib.native_hub_available():
        import pytest

        pytest.skip("native ota_hub not built")
    prop = sinr.Propagation(pathloss_db=np.array([[0, 80], [80, 0]], np.float32))
    hub = distrib.NativeHub(prop, n_nodes=2, n_prb=25)
    a = distrib.NativeRemoteBus("127.0.0.1", hub.port, 0, n_prb=25)
    b = distrib.NativeRemoteBus("127.0.0.1", hub.port, 1, n_prb=25)
    t = threading.Thread(target=b.step_tti)
    t.start()
    a.step_tti()
    t.join()
    b.sock.close()  # crash, no BYE
    import pytest

    with pytest.raises(ConnectionError):
        for _ in range(3):
            a.step_tti()
    hub.stop()
