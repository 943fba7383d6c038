"""Real Linux IP integration: UDP datagrams through kernel TUN devices ride
the emulated LTE network end-to-end (gw.cc + SGi parity)."""

import socket
import time

import numpy as np
import pytest

from srslte_emane_tpu.utils import tun as tun_mod

pytestmark = pytest.mark.skipif(not tun_mod.available(),
                                reason="TUN requires root + /dev/net/tun")


def test_udp_through_emulated_network():
    from srslte_emane_tpu.apps import netsim
    from srslte_emane_tpu.epc import spgw as spgw_mod

    sysd = netsim.build_network(1, 80.0)
    net, spgw, ue = sysd["net"], sysd["spgw"], sysd["ues"][0]
    net.run(80)
    assert ue.emm_state == "REGISTERED"
    ue_ip = ue.ip_addr  # 172.16.0.2

    sgi = tun_mod.TunDevice("sgi_test", "172.16.0.1/24")
    pump_sgi = tun_mod.attach_sgi(spgw, sgi)
    try:
        # downlink: a real UDP socket sends toward the UE's IP; the kernel
        # routes it into the SGi TUN; the emulated network carries it to the
        # UE GW.
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        tx.sendto(b"hello-over-lte", (ue_ip, 4242))
        deadline = time.time() + 5
        got = None
        while time.time() < deadline and got is None:
            pump_sgi()
            net.run(5)
            for pkt in ue.gw_rx:
                if b"hello-over-lte" in pkt:
                    got = pkt
        assert got is not None, "UDP datagram did not traverse the network"
        # uplink: UE emits an IP packet; it must surface on the SGi TUN side
        # (the kernel will drop it, but the SPGW must hand it over)
        up = spgw_mod.make_ipv4(ue_ip, "172.16.0.1", b"uplink-data")
        ue.gw_send(up)
        net.run(20)
        pump_sgi()  # writes sgi_out into the TUN (kernel consumes)
        assert spgw.metrics["ul_bytes"] >= len(up)
        tx.close()
    finally:
        sgi.close()
