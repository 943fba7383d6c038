"""TS 36.523-style conformance matrix: scripted procedures driving the
PRODUCTION UE stack through state-machine edges the happy-path tests
never reach (timer expiries, rejects, security failures, wrong-identity
paging, RLF recovery) — the `srsue/test/ttcn3/` role.

Every scenario runs the unmodified `stack.ue_stack.UeStack` under
`runtime.syssim.SysSim` (ideal PHY, real 36.331 UPER + 24.301 wire
bytes, real Milenage AKA, real EIA2/EEA2 NAS security post-SMC).
"""

import pytest

from srslte_emane_tpu.runtime import syssim
from srslte_emane_tpu.stack import nas_msgs, rrc_msgs, security, ue_stack


def _ss():
    key = bytes(range(16))
    ue = ue_stack.UeStack(ue_stack.Usim(
        "001019876543210", key, security.milenage_opc(key, b"\x00" * 16)))
    return syssim.SysSim(ue), ue


def test_full_attach_with_aka_and_smc():
    """Baseline: complete attach — AKA with a real Milenage vector, NAS
    SMC activating EIA2/EEA2 (every later NAS PDU MAC-verified at the
    SS), Attach Accept/Complete."""
    ss, ue = _ss()
    ss.attach()
    assert ue.emm_state == "REGISTERED"
    assert ue.guti == 0xC0FFEE
    assert ss.nas_sec.count[0] > 0  # protected DL NAS actually flowed


def test_t300_expiry_and_reattempt():
    """36.523 8.1.1-style: the SS never answers the ConnectionRequest —
    T300 expires and the UE re-attempts random access + a fresh request."""
    ss, ue = _ss()
    ss.expect_rrc(rrc_msgs.RrcConnectionRequest, within=40)
    # stay silent: T300 (100 TTIs) must expire, then backoff, then retry
    ss.expect_rrc(rrc_msgs.RrcConnectionRequest, within=300)
    assert ue.metrics["t300_expiry"] >= 1
    assert ue.rrc_state in ("IDLE", "CONNECTING")


def test_rrc_connection_reject_wait_time():
    """36.331 §5.3.3.8: Reject with waitTime bars access for T302."""
    ss, ue = _ss()
    ss.expect_rrc(rrc_msgs.RrcConnectionRequest, within=40)
    ss.dl_ccch(rrc_msgs.RrcConnectionReject(wait_time_s=1))
    ss.step(2)
    assert ue.metrics["rrc_rejected"] == 1
    # barred: no new request while T302 runs (~1000 TTIs)
    ss.expect_none(rrc_msgs.RrcConnectionRequest, for_n=900)
    # ...and the UE comes back afterwards
    ss.expect_rrc(rrc_msgs.RrcConnectionRequest, within=400)


def test_t3410_expiry_restarts_attach():
    """24.301 §5.5.1.2.6: the network never answers the Attach Request —
    T3410 expires, the UE drops to DEREGISTERED and re-attaches."""
    ss, ue = _ss()
    ss.rrc_connect()
    ss.expect_nas(nas_msgs.AttachRequest)
    ss.expect_none(rrc_msgs.RrcConnectionRequest, for_n=900)  # T3410 runs
    ss.step(200)  # expiry at 1000 TTIs
    assert ue.metrics["t3410_expiry"] >= 1
    ss.rrc_connect(within=200)
    ss.expect_nas(nas_msgs.AttachRequest, within=40)


def test_attach_reject_permanent_cause_stops_ue():
    """24.301 §5.5.1.2.5: Attach Reject #11 (PLMN not allowed) — the UE
    stops attempting entirely."""
    ss, ue = _ss()
    ss.rrc_connect()
    ss.expect_nas(nas_msgs.AttachRequest)
    ss.dl_nas(nas_msgs.AttachReject(cause=11))
    ss.step(3)
    assert ue.emm_state == "DEREGISTERED"
    assert ue.metrics["attach_reject"] == 1
    ss.dl_rrc(rrc_msgs.RrcConnectionRelease())
    ss.expect_none(rrc_msgs.RrcConnectionRequest, for_n=400)


def test_authentication_reject_invalidates_usim():
    """24.301 §5.4.2.5: Authentication Reject — the USIM is invalid
    until switch-off; no further attempts."""
    ss, ue = _ss()
    ss.rrc_connect()
    ss.expect_nas(nas_msgs.AttachRequest)
    ss.dl_nas(nas_msgs.AuthenticationReject())
    ss.step(3)
    assert ue.emm_state == "DEREGISTERED"
    assert ue.metrics["auth_reject"] == 1
    ss.dl_rrc(rrc_msgs.RrcConnectionRelease())
    ss.expect_none(rrc_msgs.RrcConnectionRequest, for_n=400)


def test_authentication_mac_failure():
    """24.301 §5.4.2.6: a corrupted AUTN MAC-A — the UE must refuse with
    Authentication Failure (mac-failure), not answer the challenge."""
    ss, ue = _ss()
    ss.rrc_connect()
    ss.expect_nas(nas_msgs.AttachRequest)
    rand, autn = ss.auth_vector(bogus_mac=True)
    ss.dl_nas(nas_msgs.AuthenticationRequest(rand=rand, autn=autn))
    fail = ss.expect_nas(nas_msgs.AuthenticationFailure)
    assert fail.cause == "mac-failure"
    assert ue.metrics["auth_mac_failure"] == 1
    # a GOOD vector afterwards still authenticates (the UE recovered)
    rand, autn = ss.auth_vector()
    ss.dl_nas(nas_msgs.AuthenticationRequest(rand=rand, autn=autn))
    ss.expect_nas(nas_msgs.AuthenticationResponse)


def test_identity_request_before_authentication():
    """24.301 §5.4.4: Identity Request (IMSI) before any security —
    the UE answers with its IMSI in the clear."""
    ss, ue = _ss()
    ss.rrc_connect()
    ss.expect_nas(nas_msgs.AttachRequest)
    ss.dl_nas(nas_msgs.IdentityRequest(identity_type="imsi"))
    resp = ss.expect_nas(nas_msgs.IdentityResponse)
    assert resp.imsi == "001019876543210"


def test_paging_identity_matching():
    """36.523 paging: a page for ANOTHER UE's S-TMSI is ignored; a page
    for OUR S-TMSI triggers connection + Service Request."""
    ss, ue = _ss()
    ss.attach()
    ss.dl_rrc(rrc_msgs.RrcConnectionRelease())
    ss.step(80)  # past the post-release access bar
    assert ue.rrc_state == "IDLE"
    ss.dl_ccch(rrc_msgs.Paging(ue_identity=0xDEAD))  # not us
    ss.expect_none(rrc_msgs.RrcConnectionRequest, for_n=60)
    ss.dl_ccch(rrc_msgs.Paging(ue_identity=0xC0FFEE))  # our GUTI
    ss.rrc_connect(within=80)
    ss.expect_nas(nas_msgs.ServiceRequest, within=40)


def test_network_initiated_detach():
    """24.301 §5.5.2.3: network-initiated Detach Request — the UE
    acknowledges and drops to DEREGISTERED."""
    ss, ue = _ss()
    ss.attach()
    ss.dl_nas(nas_msgs.DetachRequest(switch_off=False))
    ss.expect_nas(nas_msgs.DetachAccept)
    assert ue.emm_state == "DEREGISTERED"
    assert ue.metrics["nw_detach"] == 1


def test_rlf_reestablishment():
    """36.331 §5.3.7: N310 out-of-sync indications declare RLF; the UE
    sends ReestablishmentRequest with its old C-RNTI and recovers."""
    ss, ue = _ss()
    ss.attach()
    old_crnti = ue.crnti
    ss.inject_rlf()
    req = ss.expect_rrc(rrc_msgs.RrcConnectionReestablishmentRequest,
                        within=60)
    assert req.c_rnti == old_crnti
    assert ue.metrics["rlf"] == 1
    ss.dl_rrc_ccch_setup()
    ss.step(3)
    assert ue.rrc_state == "CONNECTED"
    assert ue.metrics["reest_ok"] == 1
    assert ue.emm_state == "REGISTERED"  # NAS context survived the RLF


def test_unprotected_smc_is_dropped():
    """24.301 §4.4.4.2: a PLAIN (unprotected) Security Mode Command must
    not activate security — the UE drops it silently, and the attach
    completes once the properly protected SMC arrives.  (This scenario
    caught a real violation: the typed handler used to answer an
    unprotected SMC with Security Mode Complete.)"""
    ss, ue = _ss()
    ss.rrc_connect()
    ss.expect_nas(nas_msgs.AttachRequest)
    rand, autn = ss.auth_vector()
    ss.dl_nas(nas_msgs.AuthenticationRequest(rand=rand, autn=autn))
    ss.expect_nas(nas_msgs.AuthenticationResponse)
    # SS sends the SMC UNPROTECTED: the UE must NOT complete it
    ss.dl_nas(nas_msgs.NasSecurityModeCommand(eea=2, eia=2))
    ss.expect_none(nas_msgs.NasSecurityModeComplete, for_n=30, nas=True)
    assert ue.metrics["smc_unprotected_drop"] == 1
    assert ue.nas_sec is None
    # the PROPERLY protected SMC still works afterwards
    from srslte_emane_tpu.stack import nas_wire as _nw

    ss.nas_sec = _nw.NasSecurity(ss._kasme, eia=2, eea=2)
    ss.dl_nas(nas_msgs.NasSecurityModeCommand(eea=2, eia=2), new_ctx=True)
    ss.expect_nas(nas_msgs.NasSecurityModeComplete)
    ss.dl_nas(nas_msgs.AttachAccept(guti=0xBEEF))
    ss.expect_nas(nas_msgs.AttachComplete)
    assert ue.emm_state == "REGISTERED"
