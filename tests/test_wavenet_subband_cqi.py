"""Aperiodic subband CQI on PUSCH over the waveform network: a DCI-0
CSI request makes the UE multiplex a real 36.212-coded HL-subband report
(wideband CQI + 2-bit differentials from the PHY's per-subband SNR) onto
its PUSCH; the eNB demultiplexes it and the scheduler applies
frequency-selective link adaptation (per-allocation MCS shifts by the
allocated subbands' differentials).

Reference parity: lib/src/phy/phch/cqi.c (aperiodic HL subband),
uci.c (CQI-on-PUSCH coding), sch.c UCI multiplexing,
srsenb scheduler_ue.cc frequency-selective MCS.

Runs in a subprocess (CPU XLA cumulative-compile segfault; see
test_wavenet_mimo.py).
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_subband_cqi_drives_frequency_selective_mcs():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, __file__, "run"], capture_output=True, text=True,
        env=env, timeout=3000)
    assert r.returncode == 0, \
        f"scenario failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["registered"]
    assert m["aperiodic_cqi"] >= 1  # the report arrived and was decoded
    # the ETU channel is frequency selective: the decoded report is not
    # flat (at least one subband differs from wideband)
    assert any(d != 0 for d in m["sb_cqi"]), m
    # ...and the scheduler's grants reflect it: same-width allocations in
    # different subbands carried different MCS
    assert m["distinct_mcs"] >= 2, m


def _main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    jax.config.update("jax_platforms", "cpu")
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
        enb, [ue], pathloss_db=np.asarray([60.0]), n_prb=15,
        fading_profile="etu", doppler_hz=2.0, seed=3)
    for _ in range(120):
        net.run(10)
        if ue.emm_state == "REGISTERED":
            break
    registered = ue.emm_state == "REGISTERED"
    grant_mcs = []
    if registered:
        orig = enb.get_dl_sched
        rnti = list(enb.ues)[0]

        def spy(tti):
            gs = orig(tti)
            for g in gs:
                if g.rnti == rnti and not g.harq_pid and len(g.payload) > 40:
                    pass
            return gs
        # capture the ACTUAL transmitted MCS at the waveform eNB
        orig_idx = net.enb.k.add_dl_grant

        def spy_idx(l_crbs, mcs, l_aggr, n_re):
            grant_mcs.append((l_crbs, mcs))
            return orig_idx(l_crbs, mcs, l_aggr, n_re)
        net.enb.k.add_dl_grant = spy_idx
        for _ in range(16):
            for _ in range(8):
                spgw.handle_sgi_pdu(spgw_mod.make_ipv4(
                    "8.8.8.8", ue.ip_addr, b"d" * 120))
            ue.gw_send(spgw_mod.make_ipv4(ue.ip_addr, "8.8.8.8", b"u" * 80))
            net.run(25)
    u = enb.ues[list(enb.ues)[0]] if enb.ues else None
    sb = list(getattr(u, "sb_cqi", []) or [])
    widths = {}
    for w, m in grant_mcs:
        widths.setdefault(w, set()).add(m)
    distinct = max((len(v) for v in widths.values()), default=0)
    print(json.dumps(dict(
        registered=registered,
        aperiodic_cqi=enb.metrics.get("aperiodic_cqi", 0),
        sb_cqi=sb,
        distinct_mcs=distinct,
        grants=len(grant_mcs),
    )))


if __name__ == "__main__":
    _main()
