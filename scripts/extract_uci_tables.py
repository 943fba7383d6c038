#!/usr/bin/env python3
"""Extract 36.212 Table 5.2.2.6.4-1 (RM(32,11) basis) and Table 5.2.3.3-1
(PUCCH (20,13) basis) from the reference — pure 3GPP spec data."""
import re, pathlib
import numpy as np
SRC = pathlib.Path("/root/reference/lib/src/phy/phch/uci.c")
OUT = pathlib.Path(__file__).resolve().parent.parent / "srslte_emane_tpu/phch/uci_tables.npz"
text = SRC.read_text()
def parse(name, r, c):
    m = re.search(rf"{name}\s*\[{r}\]\[{c}\]\s*=\s*\{{(.*?)\}};", text, re.S)
    nums = [int(x) for x in re.findall(r"\d+", m.group(1))]
    assert len(nums) == r*c, (name, len(nums))
    return np.array(nums, dtype=np.int8).reshape(r, c)
m32 = parse("M_basis_seq", 32, 11)
m20 = parse("M_basis_seq_pucch", 20, 13)
np.savez_compressed(OUT, rm32=m32, rm20=m20)
print("wrote", OUT, m32[0], m20[0])
