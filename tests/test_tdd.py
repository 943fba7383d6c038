"""TDD frame structure (36.211 §4.2) + DwPTS-truncated PDSCH round trip."""

import numpy as np

from srslte_emane_tpu.phch import grid as grid_mod, pdsch, sch, tdd


def test_ul_dl_patterns():
    # every config: sf0 = D, sf1 = S, sf2 = U (36.211 Table 4.2-2 invariants)
    for cfg in range(7):
        assert tdd.sf_type(cfg, 0) == "D"
        assert tdd.sf_type(cfg, 1) == "S"
        assert tdd.sf_type(cfg, 2) == "U"
    # config 1: DSUUDDSUUD
    assert tdd.dl_subframes(1) == (0, 1, 4, 5, 6, 9)
    assert tdd.ul_subframes(1) == (2, 3, 7, 8)
    # 5ms configs have a second special subframe at sf6
    for cfg in (0, 1, 2, 6):
        assert tdd.sf_type(cfg, 6) == "S"
    for cfg in (3, 4, 5):
        assert tdd.sf_type(cfg, 6) == "D"


def test_special_subframe_tables():
    for ss in range(10):
        assert tdd.nof_dw(ss) + tdd.nof_gp(ss) + tdd.nof_up(ss) == 14
        assert tdd.nof_dw_slot(ss, 0) + tdd.nof_dw_slot(ss, 1) == tdd.nof_dw(ss)
    assert tdd.nof_dw(4) == 12 and tdd.nof_up(4) == 1
    assert tdd.nof_dw(7) == 10 and tdd.nof_up(7) == 2
    assert tdd.nof_harq(0) == 7 and tdd.nof_harq(5) == 1


def test_symbol_masks():
    dl = tdd.dl_symbol_mask(2, 7)  # DSUDDDSUDD, DwPTS=10
    ul = tdd.ul_symbol_mask(2, 7)
    assert dl[0].all() and not ul[0].any()
    assert dl[1, :10].all() and not dl[1, 10:].any()
    assert ul[1, 12:].all() and not ul[1, :12].any()  # UpPTS = last 2
    assert ul[2].all() and not dl[2].any()
    assert not (dl & ul).any()


def test_dwpts_pdsch_roundtrip():
    """PDSCH in a special subframe: symbols truncated to DwPTS."""
    cell = grid_mod.CellConfig(n_prb=15, cell_id=3)
    prb_mask = (1,) * 15
    sf_idx = 1
    max_sym = tdd.pdsch_max_sym(1, 7, sf_idx)  # DwPTS = 10 symbols
    n_re = grid_mod.nof_re(cell, sf_idx, prb_mask, max_sym)
    assert n_re < grid_mod.nof_re(cell, sf_idx, prb_mask)
    qm = 4
    cfg = sch.SchConfig(tbs=(n_re * qm // 2 - 24) // 8 * 8, G=n_re * qm,
                        Qm=qm, Nl=1)
    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, (2, cfg.tbs), dtype=np.int8)
    g = pdsch.encode(tb, cfg, cell, sf_idx, 0x46, prb_mask, max_sym=max_sym)
    # GP/UpPTS symbols carry nothing but (possibly) CRS: zero beyond DwPTS
    g = np.asarray(g)
    assert np.abs(g[:, 10, :, :]).max() == 0  # symbol 10 in GP (no CRS sym)
    out, ok, _, _ = pdsch.decode(
        jnp_arr(g), cfg, cell, sf_idx, 0x46, prb_mask, max_sym=max_sym)
    assert np.asarray(ok).all()
    assert (np.asarray(out) == tb).all()


def jnp_arr(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def test_tdd_harq_timing_tables_consistent():
    """Association sets cover every DL/S subframe exactly once, land on UL
    subframes, and UL grant targets are UL subframes."""
    for cfg in range(7):
        pattern = tdd.UL_DL[cfg]
        covered = []
        for n, ks in tdd.DL_ASSOC_K[cfg].items():
            assert pattern[n] == "U", (cfg, n)
            for k in ks:
                covered.append((n - k) % 10)
        dl_sfs = [i for i, t in enumerate(pattern) if t != "U"]
        assert sorted(covered) == sorted(dl_sfs), (cfg, sorted(covered), dl_sfs)
        for n, k in tdd.UL_GRANT_K[cfg].items():
            assert pattern[n] != "U", (cfg, n)
            assert pattern[(n + k) % 10] == "U", (cfg, n, k)
    # spot values
    assert tdd.ack_subframe_for_dl(1, 0) == 7
    assert tdd.ack_subframe_for_dl(1, 9) == 13
    assert tdd.pusch_subframe_for_grant(0, 0) == 4
    assert tdd.pusch_subframe_for_grant(6, 9) == 14


def test_tdd_frame_end_to_end():
    """One full TDD frame (config 1: DSUUDDSUUD) through the waveform:
    PDSCH on D, DwPTS-PDSCH on S, PUSCH on U, ACKs at the k-set subframes."""
    import jax

    from srslte_emane_tpu.models import tdd_frame

    cell = grid_mod.CellConfig(n_prb=15, cell_id=4, cfi=1)
    cfg = tdd_frame.TddFrameConfig(cell=cell, sf_config=1, ss_config=7)
    rng = np.random.default_rng(0)
    B = 2
    dl_tbs = {sf: rng.integers(0, 2, (B, cfg.dl_cfg(sf).tbs), dtype=np.int8)
              for sf in (0, 1, 4)}
    ul_tbs = {sf: rng.integers(0, 2, (B, cfg.ul_cfg().tbs), dtype=np.int8)
              for sf in (2, 7)}
    out = tdd_frame.run_frame(cfg, dl_tbs, ul_tbs, jax.random.PRNGKey(1))
    for sf, tb in dl_tbs.items():
        bits, ok = out["dl"][sf]
        assert np.asarray(ok).all(), sf
        assert (np.asarray(bits) == tb).all(), sf
    for sf, tb in ul_tbs.items():
        bits, ok = out["ul"][sf]
        assert np.asarray(ok).all(), sf
        assert (np.asarray(bits) == tb).all(), sf
    # config 1 k-sets: sf0 acks at 7, sf1 at 7 (wait: 7-6=1), sf4 at 8
    acked_dl = sorted(dl for sfs in out["acks"].values() for dl, _ in sfs)
    assert acked_dl == [0, 1, 4]
    assert all(tdd.sf_type(1, s) == "U" for s in out["acks"])


def test_tdd_netsim_attach_and_traffic():
    """TDD end-to-end at UL/DL configuration 1 (36.211 Table 4.2-2
    "DSUUDDSUUD"): the whole network attaches and passes IP traffic with
    the eNB radiating ONLY on D/S subframes, UEs transmitting ONLY on U
    subframes, and DCI-0s only on 36.213 Table 8-2 k-associated
    subframes (phy_common.c:90-163 tables)."""
    from srslte_emane_tpu.apps import netsim
    from srslte_emane_tpu.epc import spgw as spgw_mod
    from srslte_emane_tpu.phch import tdd as tdd_mod
    from srslte_emane_tpu.runtime import otamsg

    cfg = 1
    sysd = netsim.build_network(4, 80.0, n_prb=25, tdd_config=cfg)
    net, bus, spgw, ues = (sysd[k] for k in ("net", "bus", "spgw", "ues"))

    seen = []  # (sf, is_downlink, has_dci0)
    orig = bus.send_msg

    def spy(frame):
        is_dl = frame.txc.is_downlink
        has_dci0 = bool(getattr(frame.msg, "pdcch_ul", None))
        seen.append((frame.msg.tti % 10, is_dl, has_dci0))
        return orig(frame)

    bus.send_msg = spy
    net.run(800)
    assert all(u.emm_state == "REGISTERED" for u in ues), \
        [(u.emm_state, u.mac_state) for u in ues]

    # DL traffic still flows
    u0 = ues[0]
    pkt = spgw_mod.make_ipv4("8.8.8.8", u0.ip_addr, b"tdd" * 30)
    assert spgw.handle_sgi_pdu(pkt)
    net.run(60)
    assert any(p == pkt for p in u0.gw_rx)

    assert seen, "no frames observed"
    k_sfs = set(tdd_mod.UL_GRANT_K[cfg])
    for sf, is_dl, has_dci0 in seen:
        t = tdd_mod.sf_type(cfg, sf)
        if is_dl:
            assert t in ("D", "S"), f"eNB radiated on U subframe {sf}"
            if has_dci0:
                assert sf in k_sfs, f"DCI-0 on non-associated subframe {sf}"
        else:
            assert t == "U", f"UE transmitted on {t} subframe {sf}"
    # both directions actually happened
    assert any(d for _, d, _ in seen) and any(not d for _, d, _ in seen)
