#!/usr/bin/env python3
"""Extract 36.211 Table 10.2.7.2.1-1 (NSSS b_q_m) — pure 3GPP spec data."""
import re, pathlib
import numpy as np
SRC = pathlib.Path("/root/reference/lib/include/srslte/phy/sync/nsss.h")
OUT = pathlib.Path(__file__).resolve().parent.parent / "srslte_emane_tpu/phch/nsss_tables.npz"
text = SRC.read_text()
m = re.search(r"b_q_m\[SRSLTE_NSSS_NUM_SEQ\]\[128\]\s*=\s*\{(.*?)\};", text, re.S)
nums = [int(x) for x in re.findall(r"-?1", m.group(1))]
assert len(nums) == 4*128, len(nums)
np.savez_compressed(OUT, b_q_m=np.array(nums, dtype=np.int8).reshape(4,128))
print("wrote", OUT)
