#!/usr/bin/env python3
"""Extract the ZUC spec constant tables (S0/S1 S-boxes and the key-loading
constants D) from the reference source into an npz.

These are pure 3GPP spec data (ZUC specification, TS 35.222 annex): the
S-boxes and the 15-bit D constants are normative tables, not code.  Source:
/root/reference/lib/src/common/zuc.cc:19-63.
"""

import re
import sys

import numpy as np

SRC = "/root/reference/lib/src/common/zuc.cc"


def grab(name, text):
    m = re.search(rf"{name}\[\d*\]\s*=\s*\{{(.*?)\}}\s*;", text, re.S)
    if not m:
        sys.exit(f"table {name} not found")
    vals = [int(v, 0) for v in re.findall(r"0[xX][0-9a-fA-F]+|\d+", m.group(1))]
    return np.array(vals)


def main():
    text = open(SRC).read()
    s0 = grab("S0", text).astype(np.uint8)
    s1 = grab("S1", text).astype(np.uint8)
    d = grab("EK_d", text).astype(np.uint16)
    assert s0.shape == (256,) and s1.shape == (256,) and d.shape == (16,)
    # spec sanity: S0[0]=0x3e, S1[0]=0x55, D[0]=0x44D7 (ZUC spec tables)
    assert s0[0] == 0x3E and s1[0] == 0x55 and d[0] == 0x44D7
    np.savez("srslte_emane_tpu/stack/zuc_tables.npz", s0=s0, s1=s1, d=d)
    print("wrote zuc_tables.npz", s0[:4], s1[:4], hex(d[0]))


if __name__ == "__main__":
    main()
