"""Message-level network emulation: eNB + UEs over the OTA bus with SINR
adjudication — the EMANE-mode integration test (SURVEY.md §3.1/§3.2 flows)."""

import numpy as np

from srslte_emane_tpu.runtime import otabus, phy_adapter, sinr, ttiloop
from srslte_emane_tpu.stack import mac


def _build_network(pathloss, n_prb=25):
    n = len(pathloss)
    prop = sinr.Propagation(pathloss_db=np.asarray(pathloss, np.float32))
    bus = otabus.OtaBus(prop, node_ids=list(range(n)), n_prb=n_prb)
    net = ttiloop.Network(bus)
    return bus, net


def test_attach_and_data_flow():
    """UE attaches via PRACH->RAR, then DL + UL data flow with ACKs."""
    # node 0 = eNB, node 1 = UE at moderate pathloss
    pl = [[0, 80], [80, 0]]
    bus, net = _build_network(pl)
    enb_mac = mac.EnbMac(n_prb=25, mcs=9)
    ue_mac = mac.UeMac(preamble=11)
    enb = net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=enb_mac))
    ue = net.add(phy_adapter.UePhyAdapter(bus, 1, cell_id=1, n_prb=25, stack=ue_mac))
    net.run(5)
    assert ue_mac.state == "CONNECTED"
    assert enb_mac.metrics["rach"] == 1
    rnti = ue_mac.crnti
    # DL traffic
    for i in range(3):
        enb_mac.dl_push(rnti, bytes([i]) * 200)
    # UL traffic
    ue_mac.send(b"hello-ul" * 10)
    net.run(15)
    assert len(ue_mac.rx_tbs) == 3
    assert ue_mac.rx_tbs[0] == bytes([0]) * 200
    assert enb_mac.rx_pdus[rnti] and enb_mac.rx_pdus[rnti][0] == b"hello-ul" * 10
    assert enb_mac.metrics["dl_ack"] >= 1
    assert ue.last_snr_db is not None and ue.last_snr_db > 15


def test_far_ue_fails_sinr():
    """A UE beyond the link budget never completes RACH (SINR gate)."""
    pl = [[0, 135], [135, 0]]
    bus, net = _build_network(pl)
    enb_mac = mac.EnbMac()
    ue_mac = mac.UeMac()
    net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=enb_mac))
    net.add(phy_adapter.UePhyAdapter(bus, 1, cell_id=1, n_prb=25, stack=ue_mac))
    net.run(10)
    assert ue_mac.state != "CONNECTED"
    assert enb_mac.metrics["rach"] == 0


def test_interference_between_cells():
    """Two eNBs on overlapping PRBs: the UE near cell A decodes A but the
    co-channel interferer drops SINR measurably."""
    # nodes: 0 = eNB A, 1 = eNB B (interferer), 2 = UE near A
    pl = [[0, 60, 70], [60, 0, 75], [70, 75, 0]]
    bus, net = _build_network(pl)
    mac_a, mac_b = mac.EnbMac(), mac.EnbMac()
    ue_mac = mac.UeMac()
    net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=mac_a))
    net.add(phy_adapter.EnbPhyAdapter(bus, 1, cell_id=2, n_prb=25, mac=mac_b))
    ue = net.add(phy_adapter.UePhyAdapter(bus, 2, cell_id=1, n_prb=25, stack=ue_mac))
    net.run(6)
    assert ue_mac.state == "CONNECTED"
    mac_a.dl_push(ue_mac.crnti, b"x" * 100)
    # eNB B transmits on the same PRBs to its own (absent) UEs every TTI via
    # PSS/PBCH control occupancy — interference lowers but doesn't kill SNR
    net.run(10)
    assert len(ue_mac.rx_tbs) == 1
    assert ue.last_snr_db < 40  # interference-limited, not noise-limited


def test_sinr_kernel_values():
    """Closed-form check of the batched per-RB SINR computation."""
    tx_power = np.array([0.0, 0.0])  # dBm
    used = np.ones((2, 4), np.float32)
    pl = np.array([[50.0, 70.0], [70.0, 50.0]], np.float32)
    out = np.asarray(sinr.per_rb_sinr(tx_power, used, pl, -110.0))
    # at rx 0: wanted from tx0 = -50 dBm, interf from tx1 = -70 dBm -> ~20 dB
    assert abs(out[0, 0, 0] - 20.0) < 0.1
    assert abs(out[1, 0, 0] + 20.0) < 0.1  # tx1 seen at rx0: -20 dB
