"""MAC HARQ retransmission + CQI-driven link adaptation (message level)."""

import numpy as np

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.epc import spgw as spgw_mod


def test_harq_retx_recovers_marginal_link():
    """At a marginal pathloss the data MCS fails sometimes; HARQ retx at rv2
    + RLC keep the flow lossless."""
    sysd = netsim.build_network(1, 80.0)
    net, spgw, enb, ue = sysd["net"], sysd["spgw"], sysd["enb"], sysd["ues"][0]
    net.run(80)
    ip = ue.ip_addr
    # degrade to where mcs9 QPSK-ish data sits near its threshold
    sysd["bus"].prop.pathloss_db[0, 1] = sysd["bus"].prop.pathloss_db[1, 0] = 101.0
    for i in range(20):
        spgw.handle_sgi_pdu(spgw_mod.make_ipv4("8.8.8.8", ip, bytes([i]) * 120))
        net.run(8)
    net.run(150)
    assert ue.metrics.get("dl_crc_err", 0) >= 1, dict(ue.metrics)
    assert enb.metrics.get("harq_retx", 0) >= 1, dict(enb.metrics)
    # despite PHY failures everything was delivered in order
    payloads = [p for p in ue.gw_rx if len(p) == 140]
    assert len(payloads) == 20, len(payloads)


def test_cqi_link_adaptation():
    """UE CQI reports drive the eNB's MCS choice up at high SNR and down at
    low SNR."""
    sysd = netsim.build_network(1, 70.0)  # strong link
    net, enb, ue = sysd["net"], sysd["enb"], sysd["ues"][0]
    net.run(150)
    assert enb.metrics.get("cqi_reports", 0) >= 2, dict(enb.metrics)
    ctx = list(enb.ues.values())[0]
    high_mcs = getattr(ctx, "dl_mcs", None)
    assert high_mcs is not None and high_mcs >= 20, high_mcs
    # weaken the link -> CQI drops -> MCS follows
    sysd["bus"].prop.pathloss_db[0, 1] = sysd["bus"].prop.pathloss_db[1, 0] = 103.0
    net.run(150)
    low_mcs = getattr(ctx, "dl_mcs", None)
    assert low_mcs < high_mcs, (low_mcs, high_mcs)


def test_ul_harq_retx_on_phich_nack():
    """PHICH NACK -> the UE retransmits the stored UL TB at rv2 before any
    new data (ul_harq.cc synchronous UL HARQ)."""
    from srslte_emane_tpu.runtime.phy_adapter import UlGrant
    from srslte_emane_tpu.stack import security, ue_stack

    key = bytes(range(16))
    ue = ue_stack.UeStack(ue_stack.Usim(
        "001010000000001", key, security.milenage_opc(key, b"\x00" * 16)))
    ue.crnti = 0x46
    ue.mac_state = "CONNECTED"
    ue._setup_srb1()
    ue.rlc[1].write_sdu(b"first-tb-data" * 4)
    ue.ul_grant(1, UlGrant(0x46, 0, 8, 9))
    [(g1, tb1)] = ue.get_pusch(1)
    assert g1.rv == 0
    ue.harq_ack(5, False)  # PHICH NACK
    ue.rlc[1].write_sdu(b"second" * 8)  # new data now pending too
    ue.ul_grant(9, UlGrant(0x46, 0, 8, 9))
    [(g2, tb2)] = ue.get_pusch(9)
    assert tb2 == tb1  # retransmission takes precedence over new data
    assert g2.rv == 2
    assert ue.metrics["ul_harq_retx"] == 1
    ue.harq_ack(13, True)  # ACK clears the buffer
    ue.ul_grant(17, UlGrant(0x46, 0, 8, 9))
    [(g3, tb3)] = ue.get_pusch(17)
    assert tb3 != tb1
