"""OTA hub app: the EMANE-emulator process (propagation + TTI barrier).

Usage:
    python -m srslte_emane_tpu.apps.hub_app --nodes 3 --prb 25 \
        --pathloss 80 --port 5599 --run-seconds 30
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from ..runtime import distrib, sinr


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, required=True)
    ap.add_argument("--prb", type=int, default=25)
    ap.add_argument("--pathloss", type=float, default=80.0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--run-seconds", type=float, default=30.0)
    args = ap.parse_args(argv)
    n = args.nodes
    pl = np.full((n, n), args.pathloss, np.float32)
    np.fill_diagonal(pl, 0)
    prop = sinr.Propagation(pathloss_db=pl)
    hub = distrib.OtaHub(prop, node_ids=list(range(n)), n_prb=args.prb,
                         port=args.port).start()
    print(json.dumps(dict(listening=hub.port)), flush=True)
    t0 = time.time()
    while time.time() - t0 < args.run_seconds and not hub._stop:
        time.sleep(0.2)
    print(json.dumps(dict(final_tti=hub.tti)))
    hub.stop()


if __name__ == "__main__":
    main()
