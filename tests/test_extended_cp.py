"""Extended CP for unicast: OFDM symbol layout, CRS positions, PDSCH round
trip (36.211 extended-CP tables; reference srslte_cp_t EXT paths)."""

import numpy as np

from srslte_emane_tpu.ops import channel, cplx, ofdm
from srslte_emane_tpu.phch import chest, grid as grid_mod, pdsch, sch, sync


def test_ext_cp_symbol_layout():
    p = ofdm.params(25, cp="ext")
    assert p["n_sym"] == 12
    assert p["cp0"] == p["cp"] == 512 * p["n"] // 2048
    # subframe still spans exactly 1 ms worth of samples
    assert p["sf_len"] == ofdm.params(25)["sf_len"]
    starts = ofdm._symbol_starts(25, "ext")
    assert len(starts) == 12


def test_ext_cp_ofdm_roundtrip():
    rng = np.random.default_rng(0)
    g = cplx.from_numpy(
        (rng.normal(size=(2, 12, 300)) + 1j * rng.normal(size=(2, 12, 300)))
        .astype(np.complex64))
    t = ofdm.modulate(g, 25, cp="ext")
    g2 = ofdm.demodulate(t, 25, cp="ext")
    # bf16 DFT inputs: worst-case element error ~1.5% (RMS -52 dB)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g), atol=3e-2)


def test_cp_blind_cell_search():
    """CP auto-detection (sync.c:68-78 role): cell_search(detect_cp=True)
    decodes SSS under both CP hypotheses and picks by metric — a normal-CP
    and an extended-CP cell are both identified blind, with the right CP."""
    from srslte_emane_tpu.phch import sync

    rng = np.random.default_rng(3)
    caps = []
    for cp in ("normal", "ext"):
        cell = grid_mod.CellConfig(n_prb=6, cell_id=3 * 17 + 2, cp=cp)
        g = cplx.zeros((1, cell.n_sym, cell.nre))
        g = sync.put_pss_sss(g, cell, 0)
        t = np.asarray(ofdm.modulate(g, 6, cp=cp))
        t = t + rng.normal(0, 0.01, t.shape).astype(np.float32)
        caps.append(t[0])
    batch = cplx.from_numpy(
        np.asarray([c[..., 0] + 1j * c[..., 1] for c in caps]))
    res = sync.cell_search(batch, detect_cp=True)
    assert list(np.asarray(res["cell_id"])) == [53, 53]
    assert list(np.asarray(res["cp_ext"])) == [False, True]
    assert list(np.asarray(res["sf_idx"])) == [0, 0]
    # PSS peak lands at each CP mode's own symbol-start offset
    for b, cp in enumerate(("normal", "ext")):
        assert int(np.asarray(res["pss_pos"])[b]) == sync.pss_symbol_start(6, cp)


def test_cp_blind_ue_sync_state_machine():
    """UeSync camps on an extended-CP cell without being told the CP."""
    from srslte_emane_tpu.models import ue_sync as ue_sync_mod

    cell = grid_mod.CellConfig(n_prb=6, cell_id=11, cp="ext")
    g = cplx.zeros((1, cell.n_sym, cell.nre))
    g = sync.put_pss_sss(g, cell, 0)
    t = np.asarray(ofdm.modulate(g, 6, cp="ext"))
    samples = t[0, :, 0] + 1j * t[0, :, 1]
    u = ue_sync_mod.UeSync(n_prb=6)
    s = u.step(samples.astype(np.complex64))
    assert s.cell_id == 11
    assert s.cp == "ext"
    assert s.state == "SFN_SYNC"


def test_ext_cp_crs_positions():
    cell = grid_mod.CellConfig(n_prb=6, cell_id=1, cp="ext")
    assert cell.n_sym == 12
    assert grid_mod.pilot_syms(0, "ext") == (0, 3, 6, 9)
    # CRS sequence differs from the normal-CP one (N_CP term in c_init)
    v_ext = grid_mod.crs_values(1, 0, 6, 0, "ext")
    v_norm = grid_mod.crs_values(1, 0, 6, 0, "normal")
    assert not np.allclose(v_ext, v_norm)


def test_ext_cp_pdsch_roundtrip_with_channel():
    cell = grid_mod.CellConfig(n_prb=15, cell_id=2, cp="ext")
    prb_mask = (1,) * 15
    sf_idx = 3
    n_re = grid_mod.nof_re(cell, sf_idx, prb_mask)
    qm = 4
    cfg = sch.SchConfig(tbs=(n_re * qm // 2 - 24) // 8 * 8, G=n_re * qm,
                        Qm=qm, Nl=1)
    rng = np.random.default_rng(1)
    tb = rng.integers(0, 2, (2, cfg.tbs), dtype=np.int8)
    g = pdsch.encode(tb, cfg, cell, sf_idx, 0x46, prb_mask)
    assert g.shape[1] == 12
    t = ofdm.modulate(g, 15, cp="ext")
    import jax

    rx = channel.awgn(jax.random.PRNGKey(0), t, 20.0)
    g_rx = ofdm.demodulate(rx, 15, cp="ext")
    out, ok, _, ch = pdsch.decode(g_rx, cfg, cell, sf_idx, 0x46, prb_mask)
    assert np.asarray(ok).all()
    assert (np.asarray(out) == tb).all()
    assert float(np.asarray(ch.snr_db).mean()) > 12.0
