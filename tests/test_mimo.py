"""MIMO layer map / precoding / predecoding roundtrips over random channels."""

import numpy as np
import pytest

from srslte_emane_tpu.ops import cplx, mimo


def _rand_syms(rng, shape):
    return rng.normal(size=shape + (2,)).astype(np.float32)


def test_layer_map_roundtrip_1cw_2l():
    rng = np.random.default_rng(0)
    d = _rand_syms(rng, (3, 40))
    layers = np.asarray(mimo.layer_map([d], 2))
    assert layers.shape == (3, 2, 20, 2)
    back = np.asarray(mimo.layer_demap(layers, 1)[0])
    np.testing.assert_allclose(back, d)


def test_layer_map_roundtrip_2cw_2l():
    rng = np.random.default_rng(1)
    a, b = _rand_syms(rng, (2, 30)), _rand_syms(rng, (2, 30))
    layers = mimo.layer_map([a, b], 2)
    outs = mimo.layer_demap(layers, 2)
    np.testing.assert_allclose(np.asarray(outs[0]), a)
    np.testing.assert_allclose(np.asarray(outs[1]), b)


def test_sfbc_roundtrip_flat_channel():
    rng = np.random.default_rng(2)
    d = _rand_syms(rng, (4, 60))
    layers = mimo.layer_map([d], 2)
    ports = np.asarray(mimo.precode_sfbc(layers))  # (4, 2, 60, 2)
    # flat per-port random channel, constant over RE pairs
    h = (rng.normal(size=(4, 2, 1)) + 1j * rng.normal(size=(4, 2, 1))).astype(np.complex64)
    hc = np.repeat(h, 60, axis=2)
    y = cplx.to_numpy(ports) * hc
    y = y.sum(axis=1)  # single rx antenna
    x, csi = mimo.decode_sfbc(cplx.from_numpy(y), cplx.from_numpy(hc))
    back = np.asarray(mimo.layer_demap(np.asarray(x), 1)[0])
    np.testing.assert_allclose(back, d, atol=1e-4)


@pytest.mark.parametrize("pmi", [0, 1, 2])
def test_sm2_zf_roundtrip(pmi):
    rng = np.random.default_rng(3 + pmi)
    a, b = _rand_syms(rng, (2, 50)), _rand_syms(rng, (2, 50))
    layers = mimo.layer_map([a, b], 2)
    ports = cplx.to_numpy(np.asarray(mimo.precode_sm2(layers, pmi)))  # (2,2,50)
    h = (rng.normal(size=(2, 2, 2, 1)) + 1j * rng.normal(size=(2, 2, 2, 1))).astype(np.complex64)
    hc = np.repeat(h, 50, axis=3)  # (B, rx, tx, M)
    y = np.einsum("brtm,btm->brm", hc, ports)
    # effective channel = H @ W
    w = np.asarray(mimo.PMI_2TX_2L[pmi]).astype(np.complex64)
    heff = np.einsum("brtm,tl->brlm", hc, w)
    x, csi = mimo.decode_zf2(cplx.from_numpy(y), cplx.from_numpy(heff))
    outs = mimo.layer_demap(np.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(outs[0]), a, atol=1e-3)
    np.testing.assert_allclose(np.asarray(outs[1]), b, atol=1e-3)


def test_cdd_roundtrip_zf():
    rng = np.random.default_rng(7)
    a, b = _rand_syms(rng, (1, 24)), _rand_syms(rng, (1, 24))
    layers = mimo.layer_map([a, b], 2)
    ports = cplx.to_numpy(np.asarray(mimo.precode_cdd2(layers)))
    h = (rng.normal(size=(1, 2, 2, 1)) + 1j * rng.normal(size=(1, 2, 2, 1))).astype(np.complex64)
    hc = np.repeat(h, 24, axis=3)
    y = np.einsum("brtm,btm->brm", hc, ports)
    # effective channel for CDD: H @ (W D(i) U) — reconstruct per-RE
    m = 24
    sign = np.where(np.arange(m) % 2 == 0, 1.0, -1.0)
    u = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    heff = np.zeros((1, 2, 2, m), dtype=np.complex64)
    for i in range(m):
        d = np.diag([1.0, sign[i]])
        w = (np.eye(2) / np.sqrt(2)) @ d @ u
        heff[..., i] = hc[..., i] @ w
    x, _ = mimo.decode_zf2(cplx.from_numpy(y), cplx.from_numpy(heff))
    outs = mimo.layer_demap(np.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(outs[0]), a, atol=1e-3)
    np.testing.assert_allclose(np.asarray(outs[1]), b, atol=1e-3)


def test_pmi_selection_picks_matched_beam():
    import jax.numpy as jnp

    from srslte_emane_tpu.ops import cplx, mimo

    rng = np.random.default_rng(0)
    m = 64
    for target_pmi, w in enumerate(mimo.PMI_2TX_1L):
        # channel aligned with codebook vector w -> that PMI must win
        h_row = np.conj(w)[None, None, :, None] * np.ones((1, 1, 2, m))
        h = np.stack([h_row.real, h_row.imag], -1).astype(np.float32)
        pmi, metric = mimo.pmi_select_1l(jnp.asarray(h))
        assert int(np.asarray(pmi)) == target_pmi, (target_pmi, np.asarray(metric))


def test_condition_number():
    import jax.numpy as jnp

    from srslte_emane_tpu.ops import mimo

    m = 8
    # identity channel: cn = 0 dB
    h_id = np.zeros((1, 2, 2, m, 2), np.float32)
    h_id[:, 0, 0, :, 0] = 1
    h_id[:, 1, 1, :, 0] = 1
    cn = np.asarray(mimo.cond_number_db(jnp.asarray(h_id)))
    assert np.allclose(cn, 0.0, atol=1e-3)
    # rank-deficient channel: huge cn
    h_bad = np.zeros((1, 2, 2, m, 2), np.float32)
    h_bad[:, 0, 0, :, 0] = 1
    h_bad[:, 1, 0, :, 0] = 1
    cn = np.asarray(mimo.cond_number_db(jnp.asarray(h_bad)))
    assert (cn > 60).all()
