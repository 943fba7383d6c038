#!/usr/bin/env python3
"""Extract SNOW 3G S-box tables (SR = Rijndael S-box, SQ = Dickson-based) —
constants from the public SNOW 3G specification (ETSI/SAGE UEA2&UIA2 spec)."""
import re, pathlib
import numpy as np
SRC = pathlib.Path("/root/reference/lib/src/common/snow_3g.cc")
OUT = pathlib.Path(__file__).resolve().parent.parent / "srslte_emane_tpu/stack/snow3g_tables.npz"
text = SRC.read_text()
def parse(name):
    m = re.search(rf"u8 {name}\[256\]\s*=\s*\{{(.*?)\}};", text, re.S)
    nums = [int(x, 0) for x in re.findall(r"0x[0-9a-fA-F]+|\d+", m.group(1))]
    assert len(nums) == 256, (name, len(nums))
    return np.array(nums, dtype=np.uint8)
np.savez_compressed(OUT, SR=parse("SR"), SQ=parse("SQ"))
print("wrote", OUT)
