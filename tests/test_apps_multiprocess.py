"""Four-process deployment: epc_app + hub_app + enb_app + ue_app as real OS
processes (the reference's one-binary-per-node operational model)."""

import json
import os
import subprocess
import sys
import time

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=ROOT)


def _spawn(mod, *args):
    return subprocess.Popen(
        [sys.executable, "-m", mod, *args], cwd=ROOT, env=ENV,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _first_json(proc, timeout=30):
    t0 = time.time()
    line = proc.stdout.readline()
    assert line, proc.stderr.read()[:500]
    return json.loads(line)


def test_four_process_attach():
    procs = []
    try:
        epc = _spawn("srslte_emane_tpu.apps.epc_app", "--port", "0",
                     "--run-seconds", "60")
        procs.append(epc)
        epc_port = _first_json(epc)["listening"]
        hub = _spawn("srslte_emane_tpu.apps.hub_app", "--nodes", "2",
                     "--prb", "25", "--pathloss", "80", "--run-seconds", "60")
        procs.append(hub)
        hub_port = _first_json(hub)["listening"]

        enb = _spawn("srslte_emane_tpu.apps.enb_app",
                     "--hub", f"127.0.0.1:{hub_port}", "--node-id", "0",
                     "--epc", f"127.0.0.1:{epc_port}", "--ttis", "150")
        procs.append(enb)
        ue = _spawn("srslte_emane_tpu.apps.ue_app",
                    "--hub", f"127.0.0.1:{hub_port}", "--node-id", "1",
                    "--cell", "1", "--ttis", "150",
                    "--imsi", "001010000000000")
        procs.append(ue)

        out_ue, err_ue = ue.communicate(timeout=120)
        out_enb, _ = enb.communicate(timeout=30)
        ue_result = json.loads(out_ue.strip().splitlines()[-1])
        assert ue_result["emm"] == "REGISTERED", (ue_result, err_ue[-500:])
        assert ue_result["ip"] is not None
        enb_result = json.loads(out_enb.strip().splitlines()[-1])
        assert enb_result.get("rach", 0) >= 1
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


def test_four_process_attach_native_hub():
    """Same deployment with the C++ ota_hub daemon as the OTA bus."""
    from srslte_emane_tpu.runtime import distrib

    if not distrib.native_hub_available():
        pytest.skip("native ota_hub not built (scripts/build_native.sh)")
    procs = []
    try:
        epc = _spawn("srslte_emane_tpu.apps.epc_app", "--port", "0",
                     "--run-seconds", "60")
        procs.append(epc)
        epc_port = _first_json(epc)["listening"]
        hub = _spawn("srslte_emane_tpu.apps.hub_app", "--nodes", "2",
                     "--prb", "25", "--pathloss", "80", "--run-seconds", "60",
                     "--native")
        procs.append(hub)
        hub_port = _first_json(hub)["listening"]

        enb = _spawn("srslte_emane_tpu.apps.enb_app",
                     "--hub", f"127.0.0.1:{hub_port}", "--node-id", "0",
                     "--epc", f"127.0.0.1:{epc_port}", "--ttis", "150",
                     "--native-hub")
        procs.append(enb)
        ue = _spawn("srslte_emane_tpu.apps.ue_app",
                    "--hub", f"127.0.0.1:{hub_port}", "--node-id", "1",
                    "--cell", "1", "--ttis", "150", "--native-hub",
                    "--imsi", "001010000000000")
        procs.append(ue)

        out_ue, err_ue = ue.communicate(timeout=120)
        out_enb, _ = enb.communicate(timeout=30)
        ue_result = json.loads(out_ue.strip().splitlines()[-1])
        assert ue_result["emm"] == "REGISTERED", (ue_result, err_ue[-500:])
        assert ue_result["ip"] is not None
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
