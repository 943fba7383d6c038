"""TDD over the waveform network: eNB radiates only D/S subframes (with
DwPTS-truncated PDSCH in the special subframe), UEs transmit only on U
subframes, the GP/UpPTS guard is honored at IQ level, and HARQ-ACKs
bundle onto the next uplink subframe.

Reference parity: lib/src/phy/common/phy_common.c:90-163 (TDD tables),
36.211 §4.2, 36.213 §10.1 TDD ACK bundling.

Runs in a subprocess (CPU XLA segfaults after enough cumulative
in-process compiles; see test_wavenet_mimo.py).
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_tdd_config1_attach_and_traffic():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, __file__, "run"], capture_output=True, text=True,
        env=env, timeout=3000)
    assert r.returncode == 0, \
        f"tdd scenario failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["registered"]
    assert m["dl_ip_bytes"] > 2000
    assert m["ul_ip_bytes"] > 200
    assert m["pusch_ok"] >= 5
    assert m["dl_ack"] >= 3
    # every UE transmission happened on an uplink subframe
    assert m["bad_sf_tx"] == 0
    # the special subframe carried (DwPTS-truncated) downlink TBs
    assert m["s_sf_tb_ok"] >= 1
    assert m["tb_err"] <= 0.1 * max(1, m["tb_ok"])


def _main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from srslte_emane_tpu.epc import hss as hss_mod, mme as mme_mod
    from srslte_emane_tpu.epc import spgw as spgw_mod
    from srslte_emane_tpu.phch import tdd as tdd_mod
    from srslte_emane_tpu.runtime import wavenet
    from srslte_emane_tpu.stack import enb_stack, security, ue_stack

    CFG = 1  # DSUUDDSUUD
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
        enb, [ue], pathloss_db=np.asarray([70.0]), n_prb=15,
        tdd_config=CFG, ss_config=4)

    # instrument: any UE waveform on a non-U subframe is a violation,
    # and count DL TBs decoded in the special subframe
    bad_sf_tx = [0]
    orig_put = net.medium.ul_put
    def put(tti, ue_idx, samples, is_prach=False):
        if tdd_mod.sf_type(CFG, tti % 10) != "U":
            bad_sf_tx[0] += 1
        return orig_put(tti, ue_idx, samples, is_prach)
    net.medium.ul_put = put
    s_sf_ok = [0]
    orig_tb = ue.tb_decoded
    def tb(tti, payload, snr, **kw):
        if payload is not None and tdd_mod.sf_type(CFG, tti % 10) == "S":
            s_sf_ok[0] += 1
        return orig_tb(tti, payload, snr, **kw)
    ue.tb_decoded = tb

    for _ in range(120):
        net.run(10)
        if ue.emm_state == "REGISTERED":
            break
    registered = ue.emm_state == "REGISTERED"
    if registered:
        for _ in range(10):
            for _ in range(12):
                spgw.handle_sgi_pdu(spgw_mod.make_ipv4(
                    "8.8.8.8", ue.ip_addr, b"d" * 300))
            ue.gw_send(spgw_mod.make_ipv4(ue.ip_addr, "8.8.8.8", b"u" * 120))
            net.run(20)
    m = net.ues[0].metrics
    print(json.dumps(dict(
        registered=registered,
        dl_ip_bytes=sum(len(p) for p in ue.gw_rx),
        ul_ip_bytes=spgw.metrics["ul_bytes"],
        pusch_ok=net.enb.metrics["pusch_ok"],
        dl_ack=enb.metrics.get("dl_ack", 0),
        bad_sf_tx=bad_sf_tx[0],
        s_sf_tb_ok=s_sf_ok[0],
        tb_ok=m["tb_ok"], tb_err=m["tb_err"],
    )))


if __name__ == "__main__":
    _main()
