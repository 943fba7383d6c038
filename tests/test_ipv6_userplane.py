"""Dual-stack (ipv4v6) user plane: NAS PDN negotiation, SPGW v6 routing,
IPv6 ping through the emulated network.

Reference behavior: `srsue/src/stack/upper/gw.cc` IPv6 paths (interface-id
from the NAS PDN address, prefix from RA), `srsepc/src/spgw/spgw.cc`
dual-stack SGi routing, 24.301 §9.9.4.9 PDN address coding, 29.274 §8.14
PAA coding.
"""

import socket

import numpy as np

from srslte_emane_tpu.epc import gtpc, hss as hss_mod, mme as mme_mod, \
    spgw as spgw_mod
from srslte_emane_tpu.runtime import otabus, phy_adapter, sinr, ttiloop
from srslte_emane_tpu.stack import enb_stack, nas_msgs, nas_wire, security, \
    ue_stack


def test_nas_pdn_address_codes_all_types():
    """24.301 §9.9.4.9 wire forms round-trip through the NAS codec."""
    iid = bytes(range(8))
    for pdn_type, ip, want_v4 in (("ipv4", "172.16.0.9", "172.16.0.9"),
                                  ("ipv6", "", ""),
                                  ("ipv4v6", "172.16.0.9", "172.16.0.9")):
        acc = nas_msgs.AttachAccept(
            ip_addr=ip, guti=7, pdn_type=pdn_type,
            ip6_iid=iid if pdn_type != "ipv4" else b"")
        out = nas_wire.decode(nas_wire.encode(acc))
        assert out.pdn_type == pdn_type
        assert out.ip_addr == want_v4
        if pdn_type != "ipv4":
            assert out.ip6_iid == iid


def test_gtpc_paa_ipv4v6_roundtrip():
    """29.274 PAA + PDN Type IEs ride the byte-exact GTPv2-C wire."""
    req = gtpc.create_session_request("001019876543210", 0x42,
                                      pdn_type="ipv4v6")
    assert gtpc.parse_create_session_request(req)["pdn_type"] == "ipv4v6"
    resp = gtpc.create_session_response(
        "172.16.0.5", 11, 12, pdn_type="ipv4v6", ue_ip6="fd00:abcd::1:2")
    out = gtpc.parse_create_session_response(resp)
    assert out["ue_ip"] == "172.16.0.5"
    assert out["pdn_type"] == "ipv4v6"
    assert out["ue_ip6"] == "fd00:abcd::1:2"


def test_spgw_routes_ipv6_by_destination():
    spgw = spgw_mod.Spgw()
    got = []
    sess = spgw.create_session("001010000000001", got.append,
                               pdn_type="ipv4v6")
    assert sess["ue_ip6"].startswith("fd00:abcd:")
    pkt6 = spgw_mod.make_ipv6("2001:db8::1", sess["ue_ip6"], b"hello6")
    assert spgw.handle_sgi_pdu(pkt6)
    pkt4 = spgw_mod.make_ipv4("8.8.8.8", sess["ue_ip"], b"hello4")
    assert spgw.handle_sgi_pdu(pkt4)
    assert len(got) == 2
    # unknown v6 destination doesn't route
    assert not spgw.handle_sgi_pdu(
        spgw_mod.make_ipv6("2001:db8::1", "fd00:abcd::dead", b"x"))
    # release cleans the v6 route too
    spgw.release_session(sess["ue_ip"])
    assert not spgw.handle_sgi_pdu(pkt6)


def test_ipv6_ping_through_emulated_network():
    """Attach negotiating ipv4v6, then an ICMPv6 echo request from the SGi
    reaches the UE and its reply returns to the SGi — the IPv6 ping of
    VERDICT: gw.cc IPv6 user plane."""
    pl = [[0, 75], [75, 0]]
    prop = sinr.Propagation(pathloss_db=np.asarray(pl, np.float32))
    bus = otabus.OtaBus(prop, node_ids=[0, 1], n_prb=25)
    net = ttiloop.Network(bus)
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb = enb_stack.EnbStack(mme, enb_id=1, n_prb=25, pci=1)
    net.add(phy_adapter.EnbPhyAdapter(bus, 0, cell_id=1, n_prb=25, mac=enb))
    imsi, key = "001010000000001", bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
    ue = ue_stack.UeStack(ue_stack.Usim(
        imsi, key, security.milenage_opc(key, b"\x00" * 16)))
    ue.pdn_type = "ipv4v6"
    net.add(phy_adapter.UePhyAdapter(bus, 1, cell_id=1, n_prb=25, stack=ue))
    net.run(120)
    assert ue.emm_state == "REGISTERED"
    # dual stack negotiated: both addresses present and consistent
    assert ue.ip_addr and ue.ip6_addr
    assert ue.ip6_addr.startswith("fd00:abcd:")
    sess6 = socket.inet_pton(socket.AF_INET6, ue.ip6_addr)
    assert sess6 in spgw.by_ip6
    # ICMPv6 echo request from the internet side
    ping = spgw_mod.make_icmp6_echo("2001:db8::99", ue.ip6_addr,
                                    ident=0x77, seq=3)
    assert spgw.handle_sgi_pdu(ping)
    net.run(40)
    got = [p for p in ue.gw_rx if p[0] >> 4 == 6]
    assert got and got[-1][40] == 128  # echo request arrived at the UE GW
    # the kernel behind the TUN answers; the in-memory GW harness does it
    ue.gw_send(spgw_mod.icmp6_echo_reply(got[-1]))
    net.run(40)
    replies = [p for p in spgw.sgi_out if p[0] >> 4 == 6 and p[40] == 129]
    assert replies, "echo reply did not reach the SGi"
    rep = replies[-1]
    assert socket.inet_ntop(socket.AF_INET6, rep[8:24]) == ue.ip6_addr
    assert rep[44:48] == bytes.fromhex("00770003")  # ident/seq echo back
    # the IPv4 plane still works alongside
    pkt4 = spgw_mod.make_ipv4("8.8.8.8", ue.ip_addr, b"v4-too" * 10)
    assert spgw.handle_sgi_pdu(pkt4)
    net.run(40)
    assert any(p[0] >> 4 == 4 for p in ue.gw_rx)
