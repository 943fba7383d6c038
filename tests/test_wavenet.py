"""Waveform-native attach: the FULL UE life cycle through the device PHY.

The message bus is absent below L2 — `runtime/wavenet.py` carries cell
search, MIB, SIB, PRACH, RA, RRC, NAS and user data as OFDM waveforms
through per-link AWGN channels, matching the reference's ZMQ IQ mode
(`lib/src/phy/rf/rf_zmq_imp.c` + `srsue/src/phy/sync.cc:364-470`).
"""

import numpy as np
import pytest

from srslte_emane_tpu.epc import hss as hss_mod, mme as mme_mod
from srslte_emane_tpu.epc import spgw as spgw_mod
from srslte_emane_tpu.runtime import wavenet
from srslte_emane_tpu.stack import enb_stack, security, ue_stack


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """Each waveform test compiles its own kernel population; XLA's
    in-process executable cache keeps them all alive, and several tests
    in one process exhaust vm.max_map_count (LLVM mmap failure ->
    segfault).  Dropping the caches between tests caps the footprint at
    one test's worth."""
    yield
    import jax

    jax.clear_caches()


def build(n_ues=2, n_prb=6, pathloss=80.0, seed=0):
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb = enb_stack.EnbStack(mme, enb_id=1, n_prb=n_prb)
    ues = []
    for i in range(n_ues):
        imsi = f"00101000000000{i:02d}"
        key = bytes(range(16))
        hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
        opc = security.milenage_opc(key, b"\x00" * 16)
        ues.append(ue_stack.UeStack(ue_stack.Usim(imsi, key, opc),
                                    preamble=7 + i))
    net = wavenet.WaveformNetwork(
        enb, ues, pathloss_db=np.full(n_ues, pathloss), n_prb=n_prb,
        seed=seed)
    return net, enb, ues, mme, spgw


@pytest.mark.slow
def test_waveform_native_attach_and_traffic():
    """Two UEs power on, find the cell, RACH, attach, and pass IP traffic
    entirely over waveforms (no bus message below RRC anywhere)."""
    net, enb, ues, mme, spgw = build(n_ues=2)

    for _ in range(8):  # up to 400 TTIs in 50-TTI slabs
        net.run(50)
        if all(u.emm_state == "REGISTERED" for u in ues):
            break
    assert all(u.emm_state == "REGISTERED" for u in ues), \
        [(u.emm_state, u.rrc_state) for u in ues]
    assert all(u.rrc_state == "CONNECTED" for u in ues)
    assert all(u.ip_addr for u in ues)
    # the PHY evidence: every control step really happened on waveforms
    assert net.enb.metrics["prach_det"] >= 2
    assert net.enb.metrics["pusch_ok"] >= 4   # Msg3 + NAS uplinks
    assert net.enb.metrics["pucch_det"] >= 2  # ACKs and SRs
    for ue in net.ues:
        assert ue.metrics["prach_tx"] == 1
        assert ue.metrics["tb_ok"] >= 4       # RAR, RRC setup, NAS DL
        assert ue.state == "CAMP"

    # downlink user-plane traffic: SPGW -> GTP -> PDSCH -> UE gw
    u0 = ues[0]
    pkt = spgw_mod.make_ipv4("8.8.8.8", u0.ip_addr, b"waveform-ip")
    assert spgw.handle_sgi_pdu(pkt)
    before = net.enb.metrics["dl_tx"]
    net.run(30)
    assert any(p == pkt for p in u0.gw_rx)
    assert net.enb.metrics["dl_tx"] > before  # it rode a real PDSCH


@pytest.mark.slow
def test_waveform_native_low_snr_still_attaches():
    """At 30 dB more pathloss the link still closes (AWGN, MCS floors)."""
    net, enb, ues, mme, spgw = build(n_ues=1, pathloss=105.0, seed=3)
    for _ in range(8):
        net.run(50)
        if ues[0].emm_state == "REGISTERED":
            break
    assert ues[0].emm_state == "REGISTERED"


@pytest.mark.slow
def test_waveform_native_attach_through_epa_fading():
    """The whole life cycle still completes through an EPA tapped-delay
    -line channel (block fading per subframe, 36.101 Annex B.2 — the
    reference's fading.c role over its ZMQ IQ path)."""
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb = enb_stack.EnbStack(mme, enb_id=1, n_prb=6)
    key = bytes(range(16))
    hss.add(hss_mod.Subscriber(imsi="001010000000007", key=key))
    opc = security.milenage_opc(key, b"\x00" * 16)
    ue = ue_stack.UeStack(ue_stack.Usim("001010000000007", key, opc),
                          preamble=9)
    net = wavenet.WaveformNetwork(
        enb, [ue], pathloss_db=np.full(1, 70.0), n_prb=6, seed=5,
        fading_profile="epa", doppler_hz=5.0)
    for _ in range(10):
        net.run(50)
        if ue.emm_state == "REGISTERED":
            break
    assert ue.emm_state == "REGISTERED"
    assert ue.ip_addr


@pytest.mark.slow
def test_waveform_sfn_sync_from_mib():
    """The UE's protocol time comes from SSS + the decoded MIB, not the
    driver's tick: start the eNB mid-frame-space (SFN 137) and the UE
    must still attach, with its own tti equal to the eNB's
    (srsue/src/phy/sync.cc:408 SFN_SYNC role)."""
    net, enb, ues, mme, spgw = build(n_ues=1, seed=11)
    net.tti = 1370  # eNB starts at SFN 137, subframe 0
    for _ in range(8):
        net.run(50)
        if ues[0].emm_state == "REGISTERED":
            break
    assert ues[0].emm_state == "REGISTERED"
    ue_phy = net.ues[0]
    assert ue_phy.state == "CAMP"
    # the UE's self-derived clock tracks the eNB's frame counter exactly
    assert ue_phy.tti == net.tti - 1, (ue_phy.tti, net.tti)


@pytest.mark.slow
def test_waveform_20ues_collision_free_and_mac_pcap(tmp_path):
    """36.213 resource mappings at scale: 20 UEs attach over waveforms
    with spec-derived PUCCH (n_CCE + N1 HARQ-ACK, RRC-dedicated SR) and
    PHICH (lowest-PRB (group, seq)) resources — the rnti%N conventions
    they replace collide beyond ~8-16 UEs.  The eNB MAC PCAP written
    along the way must re-dissect, padding subheaders included."""
    from srslte_emane_tpu.utils import pcap as pcap_mod
    from srslte_emane_tpu.stack import pdu as pdu_mod

    n_ues = 20
    hss = hss_mod.Hss()
    spgw = spgw_mod.Spgw()
    mme = mme_mod.Mme(hss, spgw)
    enb = enb_stack.EnbStack(mme, enb_id=1, n_prb=25)
    ues = []
    for i in range(n_ues):
        imsi = f"00101000000001{i:02d}"
        key = bytes(range(16))
        hss.add(hss_mod.Subscriber(imsi=imsi, key=key))
        opc = security.milenage_opc(key, b"\x00" * 16)
        ues.append(ue_stack.UeStack(ue_stack.Usim(imsi, key, opc),
                                    preamble=3 + 3 * i))
    path = str(tmp_path / "wave_mac.pcap")
    mac_pcap = pcap_mod.MacPcap(path)
    net = wavenet.WaveformNetwork(
        enb, ues, pathloss_db=np.full(n_ues, 80.0), n_prb=25, seed=7,
        pcap=mac_pcap)
    for _ in range(30):
        net.run(100)
        if all(u.emm_state == "REGISTERED" for u in ues):
            break
    n_reg = sum(u.emm_state == "REGISTERED" for u in ues)
    assert n_reg == n_ues, [
        (u.emm_state, u.rrc_state, u.mac_state) for u in ues]
    # distinct dedicated SR resources, all above the dynamic ACK region
    from srslte_emane_tpu.phch import pdcch
    n_cce = pdcch.n_cce(net.cell)
    sr_res = [u.sr_pucch_res for u in ues]
    assert len(set(sr_res)) == n_ues, sr_res
    assert all(r >= n_cce for r in sr_res)
    mac_pcap.close()

    # the PCAP dissects: every record's payload re-parses as a MAC PDU
    # (or RAR), and padded PDUs carry real 36.321 padding subheaders
    raw = open(path, "rb").read()
    assert len(raw) > 24
    import struct
    pos = 24
    n_rec, n_pad = 0, 0
    while pos < len(raw):
        _, _, incl, _ = struct.unpack("!IIII", raw[pos + 0 : pos + 16])
        rec = raw[pos + 16 : pos + 16 + incl]
        pos += 16 + incl
        # strip the MAC-LTE context header (utils/pcap.py framing):
        # radio(1) dir(1) rnti_type(1) [tag rnti(2)] [tag ueid(2)]
        # [tag subframe(2)] tag_payload(1)
        assert rec[3] == 2 and rec[6] == 3 and rec[9] == 4  # tags
        payload = rec[13:]
        n_rec += 1
        if pdu_mod.is_rar(payload):
            pdu_mod.unpack_rar(payload)
            continue
        subs = pdu_mod.unpack(payload)  # raises on a corrupt header walk
        # a padded PDU re-packs strictly shorter without the tb_size:
        # its wire image carries real 36.321 padding subheaders
        if subs and len(pdu_mod.pack(subs)) < len(payload):
            n_pad += 1
        for lcid, sdu in subs:
            assert lcid != pdu_mod.LCID_PAD
    assert n_rec >= 4 * n_ues  # RAR + setup + NAS traffic, both ways
    assert n_pad > 0  # padding subheaders really occur on the wire


@pytest.mark.slow
def test_waveform_attach_with_dynamic_delay_and_hst():
    """Attach completes through a sinusoidally sweeping path delay
    (channel/delay.c role) plus the 36.101 B.3 HST Doppler trajectory —
    the CP absorbs the delay, the chest tracks the shift."""
    net, enb, ues, mme, spgw = build(n_ues=1, seed=21)
    # 0.2..1.5 us sweep (<=3 samples at 1.92 Msps, inside the 4.7 us CP)
    net.medium.dyn_delay = (0.2, 1.5, 1.0)
    net.medium.hst_fd_hz = 40.0
    for _ in range(12):
        net.run(50)
        if ues[0].emm_state == "REGISTERED":
            break
    assert ues[0].emm_state == "REGISTERED"
    assert ues[0].ip_addr


@pytest.mark.slow
def test_waveform_rlf_outage_reestablishment():
    """A periodic outage (channel/rlf.c role) kills the link mid-session:
    the UE's sync indications trip N310/T310 radio-link failure and the
    connection recovers via RRC reestablishment — all over waveforms."""
    net, enb, ues, mme, spgw = build(n_ues=1, seed=23)
    ue = ues[0]
    for _ in range(8):
        net.run(50)
        if ue.emm_state == "REGISTERED":
            break
    assert ue.emm_state == "REGISTERED"

    # outage longer than T310 (SIB2: n310=10, t310=1000ms): 1.6 s dead
    # every 4 s — the timer expires mid-outage and RLF is declared; the
    # link is back before the reestablishment RACH retries give up
    net.medium.rlf = (4.0, 1.6)
    # keep DL traffic flowing so the loss is observable
    pkt = spgw_mod.make_ipv4("8.8.8.8", ue.ip_addr, b"rlf" * 20)
    for _ in range(40):
        spgw.handle_sgi_pdu(pkt)
        net.run(100)
        if ue.metrics.get("rlf", 0) >= 1 and ue.rrc_state == "CONNECTED" \
                and not net.medium.in_outage(net.tti):
            break
    assert ue.metrics.get("rlf", 0) >= 1, dict(ue.metrics)
    # recovered: reestablishment completed and user plane works again
    assert ue.rrc_state == "CONNECTED", (ue.rrc_state, dict(ue.metrics))
    n_before = len(ue.gw_rx)
    spgw.handle_sgi_pdu(pkt)
    net.run(40)
    assert len(ue.gw_rx) > n_before


@pytest.mark.slow
def test_waveform_cqi_drives_link_adaptation():
    """Periodic wideband CQI rides PUCCH format 2 (format 2a when a HARQ
    bit collides) over the air, and the eNB's CQI->MCS link adaptation
    (scheduler_ue.cc role) actually governs the waveform PDSCH MCS."""
    net, enb, ues, mme, spgw = build(n_ues=2, n_prb=15, seed=31)
    for _ in range(10):
        net.run(50)
        if all(u.emm_state == "REGISTERED" for u in ues):
            break
    assert all(u.emm_state == "REGISTERED" for u in ues)

    # keep traffic + reporting going for a few CQI periods
    for u in ues:
        pkt = spgw_mod.make_ipv4("8.8.8.8", u.ip_addr, b"cqi" * 40)
        for _ in range(3):
            spgw.handle_sgi_pdu(pkt)
    net.run(120)
    assert enb.metrics.get("cqi_reports", 0) >= 2, dict(enb.metrics)
    # at 54 dB link SNR the reported CQI drives the MCS far above the
    # cell default — the adaptation is visible in the UE context
    mcs = [u.dl_mcs for u in enb.ues.values() if hasattr(u, "dl_mcs")]
    assert mcs and max(mcs) > enb.mcs, (mcs, enb.mcs)
    # and traffic still decodes at the adapted MCS
    u0 = ues[0]
    n_before = len(u0.gw_rx)
    pkt = spgw_mod.make_ipv4("8.8.8.8", u0.ip_addr, b"fast" * 50)
    spgw.handle_sgi_pdu(pkt)
    net.run(40)
    assert len(u0.gw_rx) > n_before
