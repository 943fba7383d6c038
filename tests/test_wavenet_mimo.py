"""2x2 MIMO (TM3) over the waveform network: RI feedback closes the
loop, rank-2 grants carry two codewords on DCI format 2A, and a
rank-deficient link falls back to rank 1.

Reference parity: lib/src/phy/mimo/precoding.c (large-delay CDD),
srsenb scheduler_ue.cc two-TB grants, cqi.c RI reporting, the 150 Mb/s
TM3/TM4 headline of debian/man/srsenb.txt:17.

Each scenario runs in its OWN subprocess: the CPU XLA backend segfaults
nondeterministically after several hundred cumulative in-process
compiles (observed repeatedly while compiling the second scenario's
kernel population on top of the first's), so isolation is load-bearing.
"""

import json
import os
import subprocess
import sys

import pytest


def _scenario(name):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, __file__, name], capture_output=True, text=True,
        env=env, timeout=3000)
    assert r.returncode == 0, \
        f"{name} failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_tm3_rank2_doubles_throughput():
    """Well-conditioned 2x2 at high SNR: the UE reports RI 2, the
    scheduler issues two-codeword TM3 grants on DCI 2A, and delivered
    DL throughput is ~2x the SISO run of the same network."""
    m = _scenario("rank2")
    assert m["ri_reports"] >= 1
    assert m["ri"] == 2
    assert m["tm3_mac"] >= 10  # rank-2 grants flowed...
    assert m["tm3_phy"] >= 10  # ...over the waveform
    # ~2x spatial-multiplexing gain (allow scheduler overheads)
    assert m["bytes_mimo"] >= 1.6 * m["bytes_siso"], m
    # both codewords decode: no error floor
    assert m["tb_err"] <= 0.05 * m["tb_ok"], m


@pytest.mark.slow
def test_rank_deficient_link_falls_back_to_rank1():
    """A near-rank-1 channel (sigma2/sigma1 = 0.05): the RI probe
    reports rank 1 and the scheduler never issues TM3 grants — but
    traffic still flows on the rank-1 fallback."""
    m = _scenario("fallback")
    assert m["ri"] == 1
    assert m["tm3_mac"] == 0
    assert m["bytes_mimo"] > 0  # rank-1 fallback still delivers


# ---------------------------------------------------------------------------
# subprocess payloads
# ---------------------------------------------------------------------------

def _net(mimo, mimo_cond=None, pathloss=70.0):
    import numpy as np

    from srslte_emane_tpu.epc import hss as hss_mod, mme as mme_mod
    from srslte_emane_tpu.epc import spgw as spgw_mod
    from srslte_emane_tpu.runtime import wavenet
    from srslte_emane_tpu.stack import enb_stack, security, ue_stack

    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb = enb_stack.EnbStack(mme, enb_id=1, n_prb=15)
    imsi = "001010000000001"
    key = bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
    opc = security.milenage_opc(key, b"\x00" * 16)
    ue = ue_stack.UeStack(ue_stack.Usim(imsi, key, opc), preamble=7)
    net = wavenet.WaveformNetwork(
        enb, [ue], pathloss_db=np.asarray([pathloss]), n_prb=15,
        mimo=mimo, mimo_cond=mimo_cond)
    for _ in range(80):
        net.run(10)
        if ue.emm_state == "REGISTERED":
            break
    assert ue.emm_state == "REGISTERED"
    return net, enb, ue, spgw


def _saturate_and_run(net, ue, spgw, n_ttis=400):
    from srslte_emane_tpu.epc import spgw as spgw_mod

    got0 = sum(len(p) for p in ue.gw_rx)
    for _ in range(n_ttis // 20):
        for _ in range(40):
            spgw.handle_sgi_pdu(spgw_mod.make_ipv4(
                "8.8.8.8", ue.ip_addr, b"d" * 400))
        net.run(20)
    return sum(len(p) for p in ue.gw_rx) - got0


def _main(name):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    jax.config.update("jax_platforms", "cpu")
    if name == "rank2":
        net_m, enb_m, ue_m, spgw_m = _net(mimo=True)
        net_s, enb_s, ue_s, spgw_s = _net(mimo=False)
        net_m.run(90)
        rnti = list(enb_m.ues)[0]
        out = dict(
            ri_reports=enb_m.metrics.get("ri_reports", 0),
            ri=getattr(enb_m.ues[rnti], "ri", 1),
            bytes_mimo=_saturate_and_run(net_m, ue_m, spgw_m),
            bytes_siso=_saturate_and_run(net_s, ue_s, spgw_s),
        )
        out["tm3_mac"] = enb_m.metrics.get("tm3_tx", 0)
        out["tm3_phy"] = net_m.enb.metrics.get("tm3_tx", 0)
        m = net_m.ues[0].metrics
        out["tb_ok"] = m["tb_ok"]
        out["tb_err"] = m["tb_err"]
    elif name == "fallback":
        net, enb, ue, spgw = _net(mimo=True, mimo_cond=[0.05])
        net.run(90)
        rnti = list(enb.ues)[0]
        out = dict(
            ri=getattr(enb.ues[rnti], "ri", 1),
            bytes_mimo=_saturate_and_run(net, ue, spgw, n_ttis=200),
        )
        out["tm3_mac"] = enb.metrics.get("tm3_tx", 0)
    else:
        raise SystemExit(f"unknown scenario {name}")
    print(json.dumps(out))


if __name__ == "__main__":
    _main(sys.argv[1])
