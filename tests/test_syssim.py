"""TTCN3-style conformance scripting: the production UE stack driven by the
ideal-PHY system simulator."""

from srslte_emane_tpu.runtime import syssim
from srslte_emane_tpu.stack import nas_msgs, rrc_msgs, security, ue_stack


def _ue():
    key = bytes(range(16))
    return ue_stack.UeStack(
        ue_stack.Usim("001019876543210", key, security.milenage_opc(key, b"\x00" * 16)))


def test_connection_establishment_procedure():
    """36.523-style script: RA -> ConnectionRequest -> Setup ->
    SetupComplete(+Attach Request)."""
    ue = _ue()
    ss = syssim.SysSim(ue)
    ss.step(3)
    req = ss.expect_rrc(rrc_msgs.RrcConnectionRequest)
    assert req.cause == "mo-Data"
    ss.dl_ccch(rrc_msgs.RrcConnectionSetup())
    ss.step(2)
    done = ss.expect_rrc(rrc_msgs.RrcConnectionSetupComplete)
    from srslte_emane_tpu.stack import nas_wire

    # the NAS PDU is real 24.301 wire bytes (plain EMM attach request)
    assert done.nas_pdu[:2] == b"\x07\x41"
    attach = nas_wire.decode(done.nas_pdu)
    assert isinstance(attach, nas_msgs.AttachRequest)
    assert attach.imsi == "001019876543210"
    assert ue.rrc_state == "CONNECTED"


def test_capability_and_release_procedure():
    ue = _ue()
    ss = syssim.SysSim(ue)
    ss.step(3)
    ss.expect_rrc(rrc_msgs.RrcConnectionRequest)
    ss.dl_ccch(rrc_msgs.RrcConnectionSetup())
    ss.step(2)
    ss.expect_rrc(rrc_msgs.RrcConnectionSetupComplete)
    ss.dl_rrc(rrc_msgs.UECapabilityEnquiry())
    cap = ss.expect_rrc(rrc_msgs.UECapabilityInformation)
    assert cap.category >= 1
    ss.dl_rrc(rrc_msgs.RrcConnectionRelease())
    ss.step(2)
    assert ue.rrc_state == "IDLE"
