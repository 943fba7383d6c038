"""TFT packet filters + dedicated-bearer activation (tft_packet_filter.cc,
nas.cc ESM, s1ap E-RAB setup): matching flows ride the dedicated DRB in
both directions; everything else stays on the default bearer."""

import numpy as np

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.epc import spgw as spgw_mod
from srslte_emane_tpu.stack import tft


def test_packet_filter_components():
    f = tft.PacketFilter(
        filter_id=1, precedence=0,
        components=(
            (tft.PROTOCOL_ID, 17),
            (tft.SINGLE_REMOTE_PORT, 5060),
            (tft.IPV4_REMOTE_ADDR, (tft._ip("10.0.0.0"), 0xFF000000)),
        ))
    def mk(proto, dst_ip, dport):
        hdr = bytearray(20)
        hdr[0] = 0x45
        hdr[9] = proto
        hdr[12:16] = bytes([172, 16, 0, 2])
        hdr[16:20] = bytes(int(x) for x in dst_ip.split("."))
        return bytes(hdr) + np.array([12345, dport], ">u2").tobytes()
    assert f.match(mk(17, "10.1.2.3", 5060), uplink=True)
    assert not f.match(mk(6, "10.1.2.3", 5060))   # wrong protocol
    assert not f.match(mk(17, "11.1.2.3", 5060))  # outside /8
    assert not f.match(mk(17, "10.1.2.3", 5061))  # wrong port
    # wire round trip
    f2, rest = tft.PacketFilter.unpack(f.pack())
    assert rest == b"" and f2.components == f.components
    assert f2.precedence == f.precedence and f2.direction == f.direction


def test_dedicated_bearer_end_to_end():
    sysd = netsim.build_network(1, 75.0, n_prb=25)
    net, mme, spgw, enb, ue = (sysd[k] for k in
                               ("net", "mme", "spgw", "enb", "ues"))
    ue = ue[0]
    net.run(120)
    assert ue.emm_state == "REGISTERED"
    # dedicated bearer for UDP :7777 traffic
    filt = tft.PacketFilter(
        filter_id=1, precedence=0,
        components=((tft.PROTOCOL_ID, 17), (tft.SINGLE_LOCAL_PORT, 7777)))
    assert mme.activate_dedicated_bearer(1, filt.pack(), qci=1)
    net.run(60)
    assert ue.metrics["ded_bearer"] == 1
    assert mme.metrics.get("ded_bearer_ok") == 1
    lcid2 = 4  # DRB2
    assert lcid2 in ue.rlc and lcid2 in enb.ues[ue.crnti].rlc
    # downlink UDP:7777 flow rides DRB2; a TCP flow rides the default DRB
    def ip_udp(dport):
        pkt = bytearray(spgw_mod.make_ipv4("8.8.8.8", ue.ip_addr, b"z" * 40))
        pkt[9] = 17
        pkt[20:24] = np.array([9999, dport], ">u2").tobytes()
        return bytes(pkt)
    drb2_enb = enb.ues[ue.crnti].rlc[lcid2]
    before = ue.metrics["dl_ip_bytes"]
    spgw.handle_sgi_pdu(ip_udp(7777))
    net.run(30)
    assert ue.metrics["dl_ip_bytes"] > before  # delivered
    assert drb2_enb.metrics["tx_pdus"] > 0     # ...via the dedicated DRB
    # uplink: UE-originated udp:7777 uses DRB2 (local port = src port)
    ul = bytearray(spgw_mod.make_ipv4(ue.ip_addr, "8.8.8.8", b"q" * 30))
    ul[9] = 17
    ul[20:24] = np.array([7777, 53], ">u2").tobytes()
    tx_before = ue.rlc[lcid2].metrics["tx_pdus"]
    ue.gw_send(bytes(ul))
    net.run(30)
    assert ue.rlc[lcid2].metrics["tx_pdus"] > tx_before
    assert spgw.metrics["ul_bytes"] > 0
