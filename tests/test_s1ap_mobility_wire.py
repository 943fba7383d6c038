"""S1 mobility + E-RAB management as real 36.413 APER PDUs on the wire.

The repo's own S1 handover signalling (HandoverRequired -> HandoverRequest
/Acknowledge -> HandoverCommand, PathSwitchRequest) rides the multiprocess
TCP S1AP wire as the same APER bytes the reference's liblte_s1ap codec
produces (differential fuzz: scripts/s1ap_interop/fuzz_s1ap.py covers all
18 procedures byte-exact vs the compiled reference).
"""

import threading

from srslte_emane_tpu.apps import rpc
from srslte_emane_tpu.epc import mme as mme_mod, s1ap_wire
from srslte_emane_tpu.stack.asn1 import s1ap36413 as s1


def test_mobility_args_ride_as_real_pdus():
    """Each HO dataclass converts to a decodable 36.413 PDU of the right
    procedure/type and back without loss."""
    cases = [
        ("handover_required", 1,
         mme_mod.HandoverRequired(mme_ue_id=7, enb_ue_id=70, target_pci=2),
         ("initiatingMessage", s1.PROC_HANDOVER_PREPARATION)),
        ("ho_request", 0,
         mme_mod.HandoverRequest(mme_ue_id=7, kenb_star=b"\x11" * 32,
                                 ue_ip="10.45.0.2", teid_spgw=0x1234,
                                 teid_enb=0x4321),
         ("initiatingMessage", s1.PROC_HANDOVER_RESOURCE_ALLOCATION)),
        ("ho_command", 0,
         mme_mod.HandoverCommand(mme_ue_id=7, enb_ue_id=70, target_pci=2,
                                 new_rnti=0x147, dedicated_preamble=61,
                                 kenb_star=b"\x22" * 32),
         ("successfulOutcome", s1.PROC_HANDOVER_PREPARATION)),
        ("path_switch", 1,
         mme_mod.PathSwitchRequest(mme_ue_id=7, target_enb_ue_id=0x147),
         ("initiatingMessage", s1.PROC_PATH_SWITCH_REQUEST)),
    ]
    for path, idx, msg, (ptype, proc) in cases:
        args = [0, 0]
        args[idx] = msg
        wire = s1ap_wire.encode_args(path, tuple(args))
        blob = wire[idx]
        assert isinstance(blob, dict) and "__s1ap__" in blob, path
        pdu = s1.decode_pdu(blob["__s1ap__"])
        assert (pdu.pdu_type, pdu.procedure_code) == (ptype, proc), path
        back = s1ap_wire.decode_args(path, wire)
        assert back[idx] == msg, path


def test_ho_request_ack_rides_as_real_pdu():
    req = mme_mod.HandoverRequest(mme_ue_id=9, kenb_star=b"\x33" * 32,
                                  ue_ip=None, teid_spgw=1, teid_enb=2)
    res = dict(new_rnti=0x150, preamble=62)
    wire = s1ap_wire.encode_result("x.ho_request", (req,), res)
    assert "__s1ap__" in wire
    pdu = s1.decode_pdu(wire["__s1ap__"])
    assert pdu.pdu_type == "successfulOutcome"
    assert pdu.procedure_code == s1.PROC_HANDOVER_RESOURCE_ALLOCATION
    assert s1ap_wire.decode_result("x.ho_request", wire) == res


def test_s1_handover_signalling_over_tcp_wire():
    """The full S1-HO message chain crosses a real TCP S1AP wire:
    source eNB --HandoverRequired--> MME --HandoverRequest/Ack--> target,
    MME --HandoverCommand--> source, target --PathSwitchRequest--> MME."""

    class FakeTargetEnb:
        cell_pci = 2
        gtpu_dl = staticmethod(lambda pkt: None)

        def __init__(self):
            self.requests = []

        def ho_request(self, req):
            self.requests.append(req)
            return dict(new_rnti=0x150, preamble=61)

    class FakeSourceEnb:
        cell_pci = 1

        def __init__(self):
            self.commands = []

        def ho_command(self, cmd):
            self.commands.append(cmd)

    class FakeHss:
        pass

    class FakeSpgw:
        by_ip = {"10.45.0.2": dict(teid_in=7, teid_out=8)}

        def path_switch(self, ip, sink):
            self.switched = (ip, sink)

    spgw = FakeSpgw()
    mme = mme_mod.Mme.__new__(mme_mod.Mme)
    mme.hss = FakeHss()
    mme.spgw = spgw
    mme.enbs = {}
    mme.ues = {7: dict(enb_id=1, enb_ue_id=70, ue_ip="10.45.0.2",
                       state="ATTACHED",
                       vec=dict(kasme=b"\x55" * 32))}
    mme.metrics = {}
    src, tgt = FakeSourceEnb(), FakeTargetEnb()

    # the TARGET eNB behind its own RPC wire: the MME's ho_request and
    # its Acknowledge response both cross TCP as real PDUs
    tgt_srv = rpc.RpcServer(tgt, port=0)
    tgt_cli = rpc.RpcClient("127.0.0.1", tgt_srv.port)

    class TargetProxy:
        cell_pci = 2
        gtpu_dl = staticmethod(lambda pkt: None)

        def ho_request(self, req):
            return tgt_cli.call("ho_request", req)

    mme.enbs = {1: src, 2: TargetProxy()}

    # the MME behind its own RPC wire: the source eNB's HandoverRequired
    # and the target's PathSwitchRequest cross TCP as real PDUs
    mme_srv = rpc.RpcServer(mme, port=0)
    mme_cli = rpc.RpcClient("127.0.0.1", mme_srv.port)

    try:
        mme_cli.call("handover_required", 1, mme_mod.HandoverRequired(
            mme_ue_id=7, enb_ue_id=70, target_pci=2))
        assert len(tgt.requests) == 1
        req = tgt.requests[0]
        assert req.mme_ue_id == 7 and req.teid_spgw == 7
        assert len(req.kenb_star) == 32
        assert len(src.commands) == 1
        cmd = src.commands[0]
        assert (cmd.target_pci, cmd.new_rnti, cmd.dedicated_preamble) == \
            (2, 0x150, 61)
        assert cmd.kenb_star == req.kenb_star  # KeNB* consistent both legs

        mme_cli.call("path_switch", 2, mme_mod.PathSwitchRequest(
            mme_ue_id=7, target_enb_ue_id=0x150))
        assert spgw.switched[0] == "10.45.0.2"
        assert mme.ues[7]["enb_id"] == 2
        assert mme.metrics.get("handover_ok") == 1
    finally:
        tgt_cli.close()
        mme_cli.close()
        tgt_srv.stop()
        mme_srv.stop()
