"""RRC message schemas (36.331 content carried on SRB0/SRB1/SRB2).

Reference behavior: the procedures of `srsenb/src/stack/rrc/rrc.cc` and
`srsue/src/stack/rrc/rrc.cc` — connection setup, security mode, capability,
reconfiguration (DRB setup), release, paging, measurements, reestablishment.
"""

from __future__ import annotations

import dataclasses

from . import codec


@codec.register
@dataclasses.dataclass
class RrcConnectionRequest:
    ue_identity: int  # s-TMSI or random
    cause: str = "mo-Data"


@codec.register
@dataclasses.dataclass
class RrcConnectionSetup:
    srb1_config: dict = dataclasses.field(default_factory=dict)


@codec.register
@dataclasses.dataclass
class RrcConnectionSetupComplete:
    selected_plmn: int = 1
    nas_pdu: bytes = b""


@codec.register
@dataclasses.dataclass
class DlInformationTransfer:
    nas_pdu: bytes = b""


@codec.register
@dataclasses.dataclass
class UlInformationTransfer:
    nas_pdu: bytes = b""


@codec.register
@dataclasses.dataclass
class SecurityModeCommand:
    ciph_algo: int = 0
    int_algo: int = 2


@codec.register
@dataclasses.dataclass
class SecurityModeComplete:
    pass


@codec.register
@dataclasses.dataclass
class UECapabilityEnquiry:
    rat_types: tuple = ("eutra",)


@codec.register
@dataclasses.dataclass
class UECapabilityInformation:
    category: int = 4
    supports_64qam_ul: bool = False


@codec.register
@dataclasses.dataclass
class DrbToAdd:
    drb_id: int
    lcid: int
    eps_bearer_id: int
    rlc_mode: str = "am"  # "am" | "um"


@codec.register
@dataclasses.dataclass
class MobilityControlInfo:
    """Handover command content (36.331 mobilityControlInfo).

    key_change mirrors keyChangeIndicator: "s1" -> KeNB* from Kasme (fresh
    NH via MME), "x2" -> horizontal derivation from the current KeNB."""
    target_pci: int
    new_rnti: int
    dedicated_preamble: int
    key_change: str = "s1"


@codec.register
@dataclasses.dataclass
class RrcConnectionReconfiguration:
    drbs_to_add: list = dataclasses.field(default_factory=list)
    nas_pdu: bytes = b""
    meas_config: dict = dataclasses.field(default_factory=dict)
    mobility: object = None  # MobilityControlInfo for handover


@codec.register
@dataclasses.dataclass
class RrcConnectionReconfigurationComplete:
    pass


@codec.register
@dataclasses.dataclass
class RrcConnectionRelease:
    cause: str = "other"


@codec.register
@dataclasses.dataclass
class MeasurementReport:
    rsrp_dbm: float = -100.0
    rsrq_db: float = -12.0
    neigh: list = dataclasses.field(default_factory=list)


@codec.register
@dataclasses.dataclass
class Paging:
    ue_identity: int = 0


@codec.register
@dataclasses.dataclass
class RrcConnectionReestablishmentRequest:
    c_rnti: int = 0
    cause: str = "otherFailure"
