#!/usr/bin/env python3
"""Extract the 3GPP TS 36.213 TBS/MCS spec tables into an .npz data file.

These are standardized numeric tables (36.213 tables 7.1.7.1-1, 7.1.7.1-1A,
8.6.1-1A, 7.1.7.2.1-1) — pure spec data, not code.  We parse them out of the
reference header (`/root/reference/lib/src/phy/phch/tbs_tables.h`, itself
auto-generated from ETSI TS 136 213) rather than hand-typing 34x110 integers.

Run once; the output `srslte_emane_tpu/phch/tbs_tables.npz` is committed.
"""

import re
import pathlib

import numpy as np

SRC = pathlib.Path("/root/reference/lib/src/phy/phch/tbs_tables.h")
OUT = pathlib.Path(__file__).resolve().parent.parent / "srslte_emane_tpu/phch/tbs_tables.npz"


def parse_array(text, name):
    m = re.search(rf"{name}\s*\[[^\]]*\]\s*(?:\[[^\]]*\])?\s*=\s*\{{(.*?)\}};", text, re.S)
    body = m.group(1)
    # strip comments
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    nums = [int(x) for x in re.findall(r"-?\d+", body)]
    return np.array(nums, dtype=np.int64)


def main():
    text = SRC.read_text()
    dl_idx = parse_array(text, "dl_mcs_tbs_idx_table")
    dl_idx2 = parse_array(text, "dl_mcs_tbs_idx_table2")
    ul_idx = parse_array(text, "ul_mcs_tbs_idx_table")
    tbs = parse_array(text, "tbs_table").reshape(34, 110)
    np.savez_compressed(OUT, dl_mcs_to_itbs=dl_idx, dl_mcs_to_itbs_256=dl_idx2,
                        ul_mcs_to_itbs=ul_idx, tbs_table=tbs)
    print(f"wrote {OUT}: tbs_table {tbs.shape}, spot check tbs[0][0]={tbs[0,0]} tbs[26][109]={tbs[26,109]}")


if __name__ == "__main__":
    main()
