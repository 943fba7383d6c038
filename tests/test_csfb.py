"""Circuit-switched fallback (23.272): Extended Service Request, CS paging,
UE Context Modification with the CSFB indicator, and RRC release with
redirection.  Reference: srsenb rrc.cc/s1ap.cc CSFB paths, liblte_mme.cc
EXTENDED_SERVICE_REQUEST, srsepc nas.cc."""

from srslte_emane_tpu.apps import netsim
from srslte_emane_tpu.epc import spgw as spgw_mod


def _attach_one():
    sysd = netsim.build_network(1, 70.0, n_prb=25)
    sysd["net"].run(150)
    ue = sysd["ues"][0]
    assert ue.emm_state == "REGISTERED"
    return sysd, ue


def test_mo_csfb_from_connected():
    """Connected UE starts a voice call: ESR -> MME ctx-modification with
    CSFB indicator -> eNB releases with redirectedCarrierInfo -> UE camps
    on GERAN; ending the call returns it to LTE and the PS session
    resumes via Service Request."""
    sysd, ue = _attach_one()
    net, mme, enb, spgw = sysd["net"], sysd["mme"], sysd["enb"], sysd["spgw"]
    ue.start_cs_call()
    net.run(50)
    assert ue.metrics["ext_service_req"] == 1
    assert mme.metrics["csfb"] == 1
    assert enb.metrics["csfb_release"] == 1
    assert ue.cs_call_active and ue.rat == "geran"
    assert ue.rrc_state == "IDLE"
    # while on GERAN the UE never touches the LTE RACH
    net.run(100)
    assert ue.rrc_state == "IDLE" and ue.mac_state == "IDLE"
    # call ends -> back on E-UTRA; DL data pages it back into connected
    ue.end_cs_call()
    spgw.handle_sgi_pdu(spgw_mod.make_ipv4("8.8.8.8", ue.ip_addr, b"v" * 200))
    net.run(400)
    assert ue.rat == "eutra" and not ue.cs_call_active
    assert ue.emm_state == "REGISTERED"
    assert any(len(p) == 220 for p in ue.gw_rx)  # PS session survived CSFB


def test_mt_csfb_connected_via_cs_notification():
    """MT call to a CONNECTED UE: NAS CS Service Notification -> UE answers
    with ESR(mt-csfb) -> fallback release."""
    sysd, ue = _attach_one()
    net, mme = sysd["net"], sysd["mme"]
    guti = ue.guti
    mme.cs_call(guti, caller_id="15551234")
    net.run(50)
    assert ue.metrics["cs_notification"] == 1
    assert ue.metrics["ext_service_req"] == 1
    assert ue.cs_call_active and ue.rat == "geran"


def test_mt_csfb_idle_via_cs_paging():
    """MT call to an IDLE UE: CS-domain page -> UE connects and sends
    ESR(mt-csfb) from idle -> fallback release."""
    sysd, ue = _attach_one()
    net, mme, enb = sysd["net"], sysd["mme"], sysd["enb"]
    guti = ue.guti
    rnti = next(r for r, u in enb.ues.items() if u.mme_ue_id == guti)
    enb.release_ue(rnti, cause="user-inactivity")
    net.run(100)
    assert ue.rrc_state == "IDLE"
    mme.cs_call(guti)
    net.run(400)
    assert mme.metrics["cs_paging"] == 1
    assert ue.metrics["paged"] >= 1
    assert ue.metrics["ext_service_req"] == 1
    assert ue.cs_call_active and ue.rat == "geran"
    assert ue.emm_state == "REGISTERED"  # CSFB never detaches the UE
