"""System simulator: scripted ideal-PHY test driver for an unmodified UE
stack — the TTCN-3 harness role.

Reference behavior: `srsue/test/ttcn3/` — a "system simulator" with an ideal
fake PHY (lte_ttcn3_phy.cc) drives the fully unmodified UE stack against
scripted 3GPP TS 36.523 procedures (srsue/test/ttcn3/README.md:1-14).

Here SysSim impersonates the network side below RRC: it terminates the UE's
MAC-level messages directly (no OTA bus, no SINR — the "ideal PHY"), lets a
test script exchange RRC/NAS messages with the UE, and exposes expectation
helpers.  The UE under test is the production stack.ue_stack.UeStack.
"""

from __future__ import annotations

import collections

from ..stack import codec, nas_wire, pdu, rrc_msgs, rrc_wire
from ..stack.ue_stack import UeStack


class SysSim:
    """Ideal-PHY test system around one UE stack."""

    def __init__(self, ue: UeStack, rnti: int = 0x46):
        self.ue = ue
        self.rnti = rnti
        self.tti = 0
        self.ul_rrc = collections.deque()  # decoded UL RRC messages
        self.ul_nas = collections.deque()
        self._rlc_rx = {}  # lcid -> simple reassembly via mirrored RLC
        from ..stack import rlc as rlc_mod, pdcp as pdcp_mod

        self._rlc = rlc_mod.RlcAm(deliver=self._srb1_sdu)
        self._pdcp = pdcp_mod.PdcpEntity(
            deliver=self._srb1_rrc, is_srb=True, bearer_id=1, is_ue=False)

    # ---- SRB1 network side ----
    def _srb1_sdu(self, sdu):
        self._pdcp.write_pdu(sdu)

    def _srb1_rrc(self, sdu):
        msg = rrc_wire.decode_ul_dcch(sdu)
        if isinstance(msg, rrc_msgs.UlInformationTransfer):
            self.ul_nas.append(nas_wire.decode(msg.nas_pdu))
        else:
            self.ul_rrc.append(msg)

    def dl_rrc(self, msg):
        """Deliver a DL RRC message to the UE on SRB1 (ideal PHY)."""
        data = self._pdcp.write_sdu(rrc_wire.encode_dl_dcch(msg))
        self._rlc.write_sdu(data)
        self._pump_dl()

    def dl_ccch(self, msg):
        # route by logical channel, like the real MAC: SI-RNTI for BCCH,
        # P-RNTI for PCCH, C-RNTI-less DL-CCCH otherwise
        if isinstance(msg, (rrc_msgs.Sib1, rrc_msgs.Sib2, rrc_msgs.Sib3)):
            data, rnti = rrc_wire.encode_bcch(msg), self.ue.SI_RNTI
        elif isinstance(msg, rrc_msgs.Paging):
            data, rnti = rrc_wire.encode_pcch(msg), self.ue.P_RNTI
        else:
            data, rnti = rrc_wire.encode_dl_ccch(msg), None
        mac_pdu = pdu.pack([(pdu.LCID_CCCH, data)])
        self.ue.tb_decoded(self.tti, mac_pdu, 30.0, rnti=rnti)

    def _pump_dl(self):
        while self._rlc.has_data():
            p = self._rlc.read_pdu(1000)
            if p is None:
                break
            self.ue.tb_decoded(self.tti, pdu.pack([(1, p)]), 30.0)

    # ---- UL pump: grant everything the UE wants to send ----
    def step(self, n: int = 1):
        from ..runtime.phy_adapter import UlGrant

        for _ in range(n):
            self.tti += 1
            self.ue.tick()
            if self.tti == 1:  # SS broadcasts system information first
                self.dl_ccch(rrc_msgs.Sib1())
                self.dl_ccch(rrc_msgs.Sib2())
            pre = self.ue.get_prach(self.tti)
            if pre is not None:
                # immediate ideal RAR
                rar = pdu.pack_rar(rapid=pre, ta=0, ul_grant=0, t_crnti=self.rnti)
                self.ue.tb_decoded(self.tti, rar, 30.0)
            self.ue.ul_grant(self.tti, UlGrant(self.rnti, 0, 8, 9))
            for g, payload in self.ue.get_pusch(self.tti):
                for lcid, sdu in pdu.unpack(payload):
                    if lcid == pdu.LCID_CCCH:
                        self.ul_rrc.append(rrc_wire.decode_ul_ccch(sdu))
                    elif lcid == 1:
                        self._to_ue_srb1_rlc(sdu)
            self._pump_dl()

    def _to_ue_srb1_rlc(self, rlc_pdu):
        # feed UE's UL RLC PDUs into our network-side RLC entity
        self._rlc.write_pdu(rlc_pdu)

    # ---- expectations ----
    def expect_rrc(self, cls, within: int = 20):
        for _ in range(within):
            for m in self.ul_rrc:
                if isinstance(m, cls):
                    self.ul_rrc.remove(m)  # consume: a repeat expectation
                    return m               # must see a FRESH message
            self.step()
        raise AssertionError(f"UE did not send {cls.__name__}")

    def expect_nas(self, cls, within: int = 20):
        for _ in range(within):
            for m in self.ul_nas:
                if isinstance(m, cls):
                    self.ul_nas.remove(m)  # consume (see expect_rrc)
                    return m
            self.step()
        raise AssertionError(f"UE did not send {cls.__name__}")
