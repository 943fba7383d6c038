"""End-to-end PDSCH over standard fading profiles (phy_dl_test.c role) +
an EVM bound check on the equalized constellation."""

import jax
import numpy as np

from srslte_emane_tpu.models import pdsch_link
from srslte_emane_tpu.ops import channel, fading, modem, ofdm
from srslte_emane_tpu.phch import chest, grid as grid_mod, pdsch


def _link(profile, snr_db, qm=2, code_rate=0.35, seed=0):
    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=25, cell_id=2, cfi=1), qm=qm,
        code_rate=code_rate, sf_idx=1)
    rng = np.random.default_rng(seed)
    B = 4
    tb = rng.integers(0, 2, (B, cfg.tbs), dtype=np.int8)
    tx = pdsch_link.tx_subframe(tb, cfg)
    srate = ofdm.params(25)["sf_len"] * 1000.0
    faded, _ = fading.apply_fading(tx, jax.random.PRNGKey(seed), profile,
                                   srate, doppler_hz=5.0)
    rx = channel.awgn(jax.random.PRNGKey(seed + 1), faded, snr_db)
    g = ofdm.demodulate(rx, 25)
    out, ok, _, ch = pdsch.decode(g, cfg.sch_cfg, cfg.cell, 1, cfg.rnti,
                                  cfg.prb_mask, equalizer="mmse")
    return tb, np.asarray(out), np.asarray(ok)


def test_pdsch_over_epa_and_eva():
    """QPSK rate-1/3-ish decodes through EPA/EVA multipath at good SNR —
    the LS+interp channel estimator tracks the frequency selectivity."""
    for profile in ("epa", "eva"):
        tb, out, ok = _link(profile, snr_db=18.0, seed=3)
        assert ok.all(), profile
        assert (out == tb).all(), profile


def test_tx_evm_bound():
    """Clean-channel equalized constellation EVM stays under -30 dB
    (phy_dl_test.c asserts EVM/SNR bounds on the same loop)."""
    cfg = pdsch_link.LinkConfig(
        cell=grid_mod.CellConfig(n_prb=25, cell_id=2, cfi=1), qm=6,
        code_rate=0.5, sf_idx=1)
    rng = np.random.default_rng(0)
    B = 2
    tb = rng.integers(0, 2, (B, cfg.tbs), dtype=np.int8)
    tx = pdsch_link.tx_subframe(tb, cfg)
    g = ofdm.demodulate(tx, 25)
    from srslte_emane_tpu.ops import scrambling
    from srslte_emane_tpu.phch import sch

    re_idx = grid_mod.pdsch_re_indices(cfg.cell, 1, cfg.prb_mask)
    ch = chest.estimate(g, cfg.cell, 1)
    flat = np.asarray(g).reshape(B, -1, 2)
    ce = np.asarray(ch.ce).reshape(B, -1, 2)
    y = flat[:, re_idx]
    h = ce[:, re_idx]
    x_eq = (y[..., 0] + 1j * y[..., 1]) / (h[..., 0] + 1j * h[..., 1] + 1e-12)
    # reference symbols
    import jax.numpy as jnp

    cw = sch.encode_tb(tb, cfg.sch_cfg)
    scr = scrambling.scramble_bits(cw, scrambling.pdsch_cinit(cfg.rnti, 0, 1, 2))
    ref = np.asarray(modem.modulate(scr, modem.MOD_FROM_QM[6]))
    refc = ref[..., 0] + 1j * ref[..., 1]
    evm = np.sqrt(np.mean(np.abs(x_eq - refc) ** 2) / np.mean(np.abs(refc) ** 2))
    assert 20 * np.log10(evm) < -30.0, 20 * np.log10(evm)
