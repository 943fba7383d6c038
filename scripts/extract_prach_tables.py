#!/usr/bin/env python3
"""Extract 36.211 Table 5.7.2-4/-5 (PRACH logical->physical root sequence
order) from the reference header — pure 3GPP spec data."""
import re, pathlib
import numpy as np
SRC = pathlib.Path("/root/reference/lib/src/phy/phch/prach_tables.h")
OUT = pathlib.Path(__file__).resolve().parent.parent / "srslte_emane_tpu/phch/prach_tables.npz"
text = SRC.read_text()
def parse(name, n):
    m = re.search(rf"{name}\s*\[{n}\]\s*=\s*\{{(.*?)\}};", text, re.S)
    nums = [int(x) for x in re.findall(r"\d+", m.group(1))]
    assert len(nums) == n, (name, len(nums))
    return np.array(nums, dtype=np.int64)
roots = parse("prach_zc_roots", 838)
roots4 = parse("prach_zc_roots_format4", 138)
np.savez_compressed(OUT, zc_roots=roots, zc_roots_f4=roots4)
print("wrote", OUT, roots[:5], roots4[:5])
