"""Smoke-drive the waveform-native network: N UEs power on and attach with
the message bus disabled below L2 (run me with JAX_PLATFORMS=cpu)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from srslte_emane_tpu.epc import hss as hss_mod, mme as mme_mod
from srslte_emane_tpu.epc import spgw as spgw_mod
from srslte_emane_tpu.runtime import wavenet
from srslte_emane_tpu.stack import enb_stack, security, ue_stack


def build(n_ues=2, n_prb=6, pathloss=80.0):
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb = enb_stack.EnbStack(mme, enb_id=1, n_prb=n_prb)
    ues = []
    for i in range(n_ues):
        imsi = f"00101000000000{i:02d}"
        key = bytes(range(16))
        hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
        opc = security.milenage_opc(key, b"\x00" * 16)
        ues.append(ue_stack.UeStack(ue_stack.Usim(imsi, key, opc),
                                    preamble=7 + i))
    net = wavenet.WaveformNetwork(
        enb, ues, pathloss_db=np.full(n_ues, pathloss), n_prb=n_prb)
    return net, enb, ues, mme, spgw


def main():
    n_ttis = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    net, enb, ues, mme, spgw = build()
    t0 = time.time()
    step = 50
    for start in range(0, n_ttis, step):
        net.run(step)
        states = [(u.emm_state, u.rrc_state, u.mac_state) for u in ues]
        print(f"tti={net.tti} t={time.time()-t0:.1f}s states={states}")
        print(f"  enb_phy={net.enb.metrics} ue0_phy={net.ues[0].metrics}")
        print(f"  ue0_sync={net.ues[0].state} enb_mac: rach={enb.metrics['rach']}"
              f" si_tx={enb.metrics['si_tx']} attach_ok={mme.metrics['attach_ok']}")
        if all(u.emm_state == "REGISTERED" for u in ues):
            print(f"ALL REGISTERED at tti={net.tti}")
            break
    for i, u in enumerate(ues):
        print(f"ue{i}: emm={u.emm_state} rrc={u.rrc_state} ip={u.ip_addr}")


if __name__ == "__main__":
    main()
