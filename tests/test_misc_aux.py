"""Aux subsystems: detach, paced real-time mode, trace ring buffer."""

import time

import numpy as np

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.utils import trace as trace_mod


def test_detach_releases_context():
    sysd = netsim.build_network(1, 80.0)
    net, mme, ue = sysd["net"], sysd["mme"], sysd["ues"][0]
    net.run(80)
    assert ue.emm_state == "REGISTERED"
    ue.switch_off()
    net.run(20)
    assert ue.emm_state == "DEREGISTERED"
    assert any(u["state"] == "DETACHED" for u in mme.ues.values())
    assert ue.rrc_state == "IDLE"  # MME triggered UE context release


def test_paced_mode_tracks_wall_clock():
    """paced=True holds the 1 kHz TTI budget (txrx.cc real-time mode)."""
    sysd = netsim.build_network(1, 80.0, paced=True)
    net = sysd["net"]
    t0 = time.monotonic()
    net.run(50)
    dt = time.monotonic() - t0
    assert 0.045 <= dt <= 0.5, dt  # ~1 ms per TTI (generous upper bound)


def test_trace_ring_buffer(tmp_path):
    tr = trace_mod.Trace(capacity=8)
    for tti in range(12):  # wraps
        tr.push_cur_time_us(tti)
    p = tmp_path / "trace.bin"
    tr.dump(str(p))
    recs = trace_mod.Trace.load(str(p))
    assert len(recs) == 8
    tags = [r[0] for r in recs]
    assert 11 in tags  # newest retained after wrap


def test_crash_handler_writes_backtrace(tmp_path):
    import subprocess, sys

    p = tmp_path / "bt.txt"
    code = (
        "from srslte_emane_tpu.utils import crash_handler\n"
        f"crash_handler.install({str(p)!r})\n"
        "raise RuntimeError('boom')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True)
    assert r.returncode != 0
    assert b"boom" in p.read_bytes()


def test_enb_rl_failure_releases_ue():
    from srslte_emane_tpu.apps import netsim

    sysd = netsim.build_network(1, 70.0)
    net, enb, ue = sysd["net"], sysd["enb"], sysd["ues"][0]
    net.run(100)
    assert ue.emm_state == "REGISTERED"
    rnti = list(enb.ues)[0]
    enb.LINK_FAILURE_NOF_ERR = 5
    for i in range(6):
        enb.ul_crc_info(200 + i, rnti, False)
    assert enb.metrics.get("rl_failure", 0) == 1
    assert enb.metrics.get("rrc_release", 0) >= 1
