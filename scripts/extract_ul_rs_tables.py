#!/usr/bin/env python3
"""Extract 36.211 Table 5.5.1.2-1/-2 (phi values for 1/2-PRB UL base
sequences) from the reference header into an .npz — pure 3GPP spec data."""
import re, pathlib
import numpy as np

SRC = pathlib.Path("/root/reference/lib/src/phy/ch_estimation/ul_rs_tables.h")
OUT = pathlib.Path(__file__).resolve().parent.parent / "srslte_emane_tpu/phch/ul_rs_tables.npz"
text = SRC.read_text()

def parse(name, rows, cols):
    m = re.search(rf"{name}\s*\[30\]\[{cols}\]\s*=\s*\{{(.*?)\}};", text, re.S)
    nums = [int(x) for x in re.findall(r"-?\d+", m.group(1))]
    return np.array(nums, dtype=np.int64).reshape(rows, cols)

phi12 = parse("phi_M_sc_12", 30, 12)
phi24 = parse("phi_M_sc_24", 30, 24)
np.savez_compressed(OUT, phi12=phi12, phi24=phi24)
print("wrote", OUT, phi12[0][:4], phi24[29][:4])
