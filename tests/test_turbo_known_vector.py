"""The reference's known-vector turbo test (`turbodecoder_test -k`,
`lib/src/phy/fec/test/turbodecoder_test.h:75-98`): a K=504 payload and its
reference-produced rate-1/3 encoding.  Proves cross-implementation
bit-exactness of the encoder (the reference emits [d0_i, d1_i, d2_i]
triplets, tails included — `turbocoder.c:105-186`) and that our decoder
recovers the payload from the reference's encoding."""

import os
import re

import numpy as np
import pytest

from srslte_emane_tpu.ops.fec import turbo, turbodecoder

HDR = "/root/reference/lib/src/phy/fec/test/turbodecoder_test.h"
pytestmark = pytest.mark.skipif(not os.path.isfile(HDR),
                                reason="reference fixtures not mounted")


def _parse_array(src: str, name: str) -> np.ndarray:
    m = re.search(re.escape(name) + r"\[[^]]*\]\s*=\s*\{([^}]*)\}", src, re.S)
    vals = [int(t) for t in m.group(1).replace("\n", " ").split(",")
            if t.strip()]
    return np.array(vals, dtype=np.int8)


def _fixture():
    src = open(HDR).read()
    data = _parse_array(src, "known_data")
    enc = _parse_array(src, "known_data_encoded")
    assert len(data) == 504 and len(enc) == 3 * 504 + 12
    return data, enc


def test_turbo_encoder_matches_reference_known_vector():
    """Bit 1512 (the first tail bit, x_K of encoder 1) is stale in the
    reference's OWN fixture: simulating turbocoder.c:95-186 step by step
    on known_data also disagrees with known_data_encoded at exactly that
    one position.  The reference never notices because `-k` mode compares
    post-noise ERROR COUNTS, not bits.  We pin: byte-exact everywhere
    except that documented bit."""
    data, enc = _fixture()
    d0, d1, d2 = (np.asarray(x)[0] for x in turbo.turbo_encode(data[None, :]))
    ours = np.stack([d0, d1, d2], axis=-1).reshape(-1)
    mism = np.nonzero(ours != enc)[0]
    assert list(mism) == [3 * 504], mism


def test_turbo_decoder_recovers_reference_encoding():
    data, enc = _fixture()
    k = 504
    trip = enc.reshape(k + 4, 3).astype(np.float32)
    llr = (1.0 - 2.0 * trip) * 8.0
    bits, _, _ = turbodecoder.turbo_decode(
        llr[:, 0][None], llr[:, 1][None], llr[:, 2][None],
        np.ones(1, bool), k, 4, None, False)
    assert (np.asarray(bits)[0] == data).all()
