"""Randomized codec fuzzing over the 36.331 schema surface.

Two layers:
  1. Always: a deterministic 800-message corpus (100 per logical channel,
     round-robin over every message type, plus the bare UE-capability and
     reconfiguration-nonCriticalExtension-chain lanes) must encode,
     self-round-trip byte-stably, and hash to the pinned digest — any
     schema change that disturbs the wire image is caught here.
  2. When the compiled reference harness exists (`/tmp/unpack_rrc`, built
     per scripts/s1ap_interop/README.md from the reference's rrc_asn1.cc),
     every corpus message must unpack + repack BYTE-EXACT through the
     reference codec — the differential proof (reference
     `lib/test/asn1/srslte_asn1_rrc_mcs_test.cc` checks single messages;
     this sweeps the whole declared surface).

The corpus of seed 1 was verified byte-exact through the reference codec
(300 additional seed-7/seed-99 messages likewise) on 2026-08-19; re-pinned
2026-08-20 when the RN-Reconfiguration(+Complete) lanes became real
schemas (700/700 seed-1 + 160 targeted RN cases byte-exact), and again
when the reconfiguration nonCriticalExtension chain lane landed (800/800
seed-1, incl. LWA/LWIP/RCLWI + r13 SCell ext arms; the chain fuzz caught
a dropped pusch_cfg_common_r10, a mis-ranged SCellIndex-r13, and two
fixed-size BSSID fields encoded with length determinants); WLAN offload
config added next (seed-1 800/800 + seed-42 480/480 — the chain fuzz
also caught a 33rd phantom WLAN-backhaulRate value widening the enum to
6 bits); sidelink disc/comm + SCellToAddModExt-v1430 and finally the SCG
dual-connectivity container added (800/800 + 150 targeted sidelink +
150 targeted SCG cases byte-exact); V2X sidelink (r14) closed the chain
(800/800 + 200 targeted V2X — this fuzz found that the reference codec
SEGFAULTS on any SL-CommTxPoolSensingConfig-r14, INTEROP.md R6, and
that sched-mode V2X carries the small SL MAC config, not the full one);
UE-EUTRA-Capability v1060/v1090 became structural (800/800 + 150
targeted grafts), then the whole rel-11/rel-12 chain
the full rel-11/12/13 chain v1130..v1360 (19 levels) with a dedicated
chain-grafting lane (900/900 + extra seeds per level; the v1310 fuzz
caught a missed four_layer_tm3_tm4_r13 presence flag in
CA-MIMO-ParametersDL-r13); round 5 closed the rel-14/rel-15 tail —
v1430/v1440/v1450/v1460/v1510/v1520/v1530 are real schemas (EN-DC +
NR band list, EUTRA feature sets, NR PDCP, sTTI/SPT + URLLC + UDC +
1024QAM, V2X r14/r15 band combinations, MUST, CE r14) and the chain
lane grafts through all 26 levels: 900/900 seed-1 + 1350/1350 each on
seeds 77 and 1234 byte-exact.  NO opaque octets remain anywhere in the
declared RRC surface; the only exclusions left are reference defects
(lateNonCriticalExtension body drop, DRB-CountInfo zero-bit overflow,
the SL-CommTxPoolSensingConfig-r14 segfault).
"""

import hashlib
import os
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts", "s1ap_interop"))

import fuzz_rrc  # noqa: E402

N_PER_CHANNEL = 100
SEED = 1
# sha256 over the concatenated corpus encodings (deterministic generator)
PINNED_SHA = "209be607c0b31e3ff3f6f55a7d848252dc2401703a1762bc8d666a46b1f744c2"


@pytest.fixture(scope="module")
def corpus():
    return (fuzz_rrc.corpus(N_PER_CHANNEL, SEED)
            + fuzz_rrc.ue_cap_corpus(N_PER_CHANNEL, SEED)
            + fuzz_rrc.ue_cap_chain_corpus(N_PER_CHANNEL, SEED)
            + fuzz_rrc.recfg_chain_corpus(N_PER_CHANNEL, SEED))


def test_corpus_shape_and_hash(corpus):
    # 6 channels + the bare UE-EUTRA-Capability lane + the capability
    # v920..v1360 chain lane + the reconfiguration chain lane
    assert len(corpus) == 9 * N_PER_CHANNEL
    h = hashlib.sha256()
    for chan, name, b in corpus:
        h.update(chan.encode() + b"\x00" + b + b"\x00")
    digest = h.hexdigest()
    assert digest == PINNED_SHA, (
        f"corpus digest changed: {digest} — if a schema fix was intended, "
        "re-verify the corpus against the reference codec (see module "
        "docstring) and update PINNED_SHA")


def test_corpus_spans_every_message_type(corpus):
    from srslte_emane_tpu.stack.asn1 import rrc36331 as rrc
    from srslte_emane_tpu.stack.asn1.runtime import uper_decode

    kinds = set()
    for chan, name, b in corpus:
        if chan == "ue_cap":
            continue
        schema = dict(fuzz_rrc.CHANNELS)[chan]
        v = uper_decode(schema, b)
        kinds.add((chan, v["msg"][1][0]))
    # every generatable c1 alternative of every channel appears
    for chan, schema in fuzz_rrc.CHANNELS:
        for alt in fuzz_rrc._c1_alts(
                schema, fuzz_rrc.AVOID | fuzz_rrc.fuzz.DEFAULT_AVOID):
            assert (chan, alt) in kinds, (chan, alt)
    assert len(kinds) >= 22


@pytest.mark.skipif(not shutil.which("/tmp/unpack_rrc")
                    and not os.path.exists("/tmp/unpack_rrc"),
                    reason="reference harness not built (see "
                           "scripts/s1ap_interop/README.md)")
def test_differential_vs_reference_codec(corpus):
    lines = "".join(f"{chan} {name} {b.hex()}\n"
                    for chan, name, b in corpus)
    out = subprocess.run(["/tmp/unpack_rrc"], input=lines,
                         capture_output=True, text=True, timeout=300)
    got = {}
    for line in out.stdout.splitlines():
        p = line.split()
        if p[0] == "REPACK":
            got[p[1]] = p[2]
        else:
            got[p[1]] = "FAIL"
    bad = [(name, got.get(name)) for chan, name, b in corpus
           if got.get(name) != b.hex()]
    assert not bad, f"{len(bad)} divergences, first: {bad[:3]}"


# ---------------- S1AP (aligned PER, vs liblte_s1ap.cc) ----------------

import fuzz_s1ap  # noqa: E402

S1AP_N = 50
S1AP_SHA = "527802c24b505ef3c3e92761072e277670a10bdf280de3eebaa4ff91fd1bc70e"


@pytest.fixture(scope="module")
def s1ap_corpus():
    return fuzz_s1ap.corpus(S1AP_N, 1)


def test_s1ap_corpus_hash(s1ap_corpus):
    assert len(s1ap_corpus) == len(fuzz_s1ap.KINDS) * S1AP_N
    h = hashlib.sha256()
    for kind, b in s1ap_corpus:
        h.update(kind.encode() + b"\x00" + b + b"\x00")
    assert h.hexdigest() == S1AP_SHA


@pytest.mark.skipif(not os.path.exists("/tmp/s1ap_harness"),
                    reason="reference harness not built (see "
                           "scripts/s1ap_interop/README.md)")
def test_s1ap_differential_vs_liblte(s1ap_corpus):
    lines = "".join(b.hex() + "\n" for _, b in s1ap_corpus)
    out = subprocess.run(["/tmp/s1ap_harness"], input=lines,
                         capture_output=True, text=True, timeout=300)
    repacks = [l.split()[1] for l in out.stdout.splitlines()
               if l.startswith("REPACK")]
    assert len(repacks) == len(s1ap_corpus)
    bad = [i for i, (kb, r) in enumerate(zip(s1ap_corpus, repacks))
           if kb[1].hex() != r]
    assert not bad, f"{len(bad)} divergences, first at {bad[:3]}"


# ---------------- NAS (24.301 TLV, vs liblte_mme.cc) ----------------

import fuzz_nas  # noqa: E402

NAS_N = 10
NAS_SHA = "8a6b45f797bb64498ddca8fa561725255b645623dc061eae6011b448b54181a2"


@pytest.fixture(scope="module")
def nas_corpus():
    return fuzz_nas.corpus(NAS_N, 1)


def test_nas_corpus_hash(nas_corpus):
    assert len(nas_corpus) >= 44 * NAS_N  # 44 fuzzable message types
    h = hashlib.sha256()
    for name, b in nas_corpus:
        h.update(name.encode() + b"\x00" + b + b"\x00")
    assert h.hexdigest() == NAS_SHA


@pytest.mark.skipif(not os.path.exists("/tmp/nas_harness"),
                    reason="reference harness not built (see "
                           "scripts/s1ap_interop/README.md)")
def test_nas_differential_vs_liblte(nas_corpus):
    lines = "".join(f"{name} {b.hex()}\n" for name, b in nas_corpus)
    out = subprocess.run(["/tmp/nas_harness"], input=lines,
                         capture_output=True, text=True, timeout=300)
    got = {}
    for line in out.stdout.splitlines():
        p = line.split()
        got[p[1]] = p[2] if p[0] == "REPACK" else "FAIL"
    bad = [(n, got.get(n)) for n, b in nas_corpus if got.get(n) != b.hex()]
    assert not bad, f"{len(bad)} divergences, first: {bad[:3]}"
