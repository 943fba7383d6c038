"""Turbo encoder: batched matmul path vs bit-serial NumPy oracle, plus
spec invariants (all-zero input, tail termination)."""

import numpy as np
import pytest

from srslte_emane_tpu.ops.fec import cbsegm, turbo


@pytest.mark.parametrize("k", [40, 104, 512, 1056, 6144])
def test_turbo_encode_matches_serial(k):
    rng = np.random.default_rng(k)
    u = rng.integers(0, 2, size=(3, k), dtype=np.int8)
    d0, d1, d2 = (np.asarray(x) for x in turbo.turbo_encode(u))
    assert d0.shape == (3, k + 4)
    for b in range(u.shape[0]):
        r0, r1, r2 = turbo.turbo_encode_host(u[b])
        np.testing.assert_array_equal(d0[b], r0)
        np.testing.assert_array_equal(d1[b], r1)
        np.testing.assert_array_equal(d2[b], r2)


def test_turbo_encode_all_188_cb_sizes():
    """Every 36.212 Table 5.1.3-3 CB size encodes identically to the
    bit-serial oracle — the `turbocoder_test_all` sweep
    (`lib/src/phy/fec/test/CMakeLists.txt:51`).  One random block per K
    checks the QPP (f1, f2) row, the chunked matmul tables at K's divisor
    structure, and the tail packing."""
    rng = np.random.default_rng(7)
    sizes = cbsegm.TC_CB_SIZES
    assert len(sizes) == 188
    for k in sizes:
        u = rng.integers(0, 2, size=(1, int(k)), dtype=np.int8)
        d0, d1, d2 = (np.asarray(x) for x in turbo.turbo_encode(u))
        r0, r1, r2 = turbo.turbo_encode_host(u[0])
        assert (d0[0] == r0).all() and (d1[0] == r1).all() \
            and (d2[0] == r2).all(), f"K={k}"


def test_turbo_encode_zero_input():
    u = np.zeros((1, 40), dtype=np.int8)
    d0, d1, d2 = (np.asarray(x) for x in turbo.turbo_encode(u))
    assert not d0.any() and not d1.any() and not d2.any()


def test_qpp_interleaver_is_permutation():
    for k in [40, 136, 6144]:
        p = turbo.qpp_interleaver(k)
        assert sorted(p.tolist()) == list(range(k))


def test_cbsegm_cases():
    # single block, no fillers
    s = cbsegm.cbsegm(40 - 24)
    assert s.C == 1 and s.K_plus == 40 and s.F == 0
    # single block with filler
    s = cbsegm.cbsegm(30)
    assert s.C == 1 and s.K_plus == 56 and s.F == 56 - 54
    # multi-block: TBS 20000 -> B=20024, C=4, B'=20120
    s = cbsegm.cbsegm(20000)
    assert s.C == 4
    assert s.C_plus * s.K_plus + s.C_minus * s.K_minus - s.F == 20000 + 24 + s.C * 24
    # largest single-CB case
    s = cbsegm.cbsegm(6144 - 24)
    assert s.C == 1 and s.K_plus == 6144 and s.F == 0
