"""App shell, metrics hub, ostatistic endpoint, PCAP, config system."""

import json
import os
import socket
import struct

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.utils import config as config_mod
from srslte_emane_tpu.utils import metrics as metrics_mod
from srslte_emane_tpu.utils import pcap as pcap_mod


def test_netsim_runs_and_attaches(tmp_path):
    summary = netsim.main([
        "--ues", "2", "--ttis", "250",
        "--csv", str(tmp_path / "m.csv"),
    ])
    assert summary["attached"] == 2
    assert summary["dl_ip_bytes"] > 0 and summary["ul_ip_bytes"] > 0
    assert summary["realtime_factor"] > 1.0  # faster than real time
    assert (tmp_path / "m.csv").exists()


def test_ostat_endpoint_query():
    hub = metrics_mod.MetricsHub()
    hub.add_source("mac", lambda: {"dl_bytes": 123})
    srv = metrics_mod.OStatServer(hub)
    hub.poll()
    try:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=2)
        s.sendall(b'{"q":"mac"}')
        s.shutdown(socket.SHUT_WR)
        resp = json.loads(s.recv(4096))
        assert resp == {"dl_bytes": 123}
    finally:
        srv.stop()


def test_mac_pcap_format(tmp_path):
    p = tmp_path / "mac.pcap"
    w = pcap_mod.MacPcap(str(p))
    w.write_pdu(b"\x3f\x00\x01\x02", rnti=0x46, tti=3, is_dl=True)
    w.close()
    raw = p.read_bytes()
    magic, _, _, _, _, _, dlt = struct.unpack("!IHHiIII", raw[:24])
    assert magic == 0xA1B2C3D4 and dlt == 147
    assert raw[24 + 16] == pcap_mod.FDD_RADIO  # first context byte


def test_config_layering(tmp_path):
    conf = tmp_path / "enb.conf"
    conf.write_text("[enb]\nn_prb = 50\ncell_id = 7\n[log]\nlog_level = debug\n")
    cfg = config_mod.load(config_mod.EnbConfig, str(conf), ["--n_prb=100"])
    assert cfg.n_prb == 100  # CLI wins
    assert cfg.cell_id == 7  # file wins over default
    assert cfg.log_level == "debug"
    assert cfg.mcs == 9  # default preserved


def test_rlc_and_s1ap_pcap(tmp_path):
    from srslte_emane_tpu.utils import pcap

    p1 = tmp_path / "rlc.pcap"
    w = pcap.RlcPcap(str(p1))
    w.write_pdu(b"\x80\x01payload", rnti=0x46, lcid=3, is_dl=True,
                mode=pcap.RlcPcap.MODE_AM)
    w.write_pdu(b"\x00um", rnti=0x46, lcid=4, is_dl=False,
                mode=pcap.RlcPcap.MODE_UM, sn_bits=5)
    w.close()
    data = p1.read_bytes()
    assert data[:4] == b"\xa1\xb2\xc3\xd4"  # pcap magic (big endian)
    assert len(data) > 24 + 2 * 16
    # Wireshark rlc-lte UDP framing: dummy UDP ports + "rlc-lte" magic
    assert data.count(b"rlc-lte") == 2
    first = data.index(b"rlc-lte")
    assert data[first - 8 : first - 4] == b"\xde\xad\xbe\xef"
    # UM record carries the SN-length tag (0x02) right after the mode byte
    second = data.index(b"rlc-lte", first + 1)
    assert data[second + 7] == pcap.RlcPcap.MODE_UM
    assert data[second + 8 : second + 10] == bytes([0x02, 5])

    p2 = tmp_path / "s1ap.pcap"
    s = pcap.S1apPcap(str(p2))
    s.write_pdu(b"s1ap-initial-context")
    s.close()
    assert p2.read_bytes()[:4] == b"\xa1\xb2\xc3\xd4"
