"""NAS EMM/ESM message schemas (24.301 content).

Reference behavior: `srsue/src/stack/upper/nas.cc` (attach, authentication,
security mode, PDN connectivity, service request) and `srsepc/src/mme/nas.cc`.
"""

from __future__ import annotations

import dataclasses

from . import codec


@codec.register
@dataclasses.dataclass
class AttachRequest:
    imsi: str
    pdn_type: str = "ipv4"
    esm_pdn_connectivity: bool = True


@codec.register
@dataclasses.dataclass
class AuthenticationRequest:
    rand: bytes
    autn: bytes


@codec.register
@dataclasses.dataclass
class AuthenticationResponse:
    res: bytes


@codec.register
@dataclasses.dataclass
class AuthenticationReject:
    pass


@codec.register
@dataclasses.dataclass
class NasSecurityModeCommand:
    eea: int = 0
    eia: int = 2


@codec.register
@dataclasses.dataclass
class NasSecurityModeComplete:
    pass


@codec.register
@dataclasses.dataclass
class AttachAccept:
    ip_addr: str = "172.16.0.2"
    guti: int = 0
    eps_bearer_id: int = 5
    # activate default EPS bearer context request is piggybacked


@codec.register
@dataclasses.dataclass
class AttachComplete:
    pass


@codec.register
@dataclasses.dataclass
class DetachRequest:
    switch_off: bool = True


@codec.register
@dataclasses.dataclass
class ServiceRequest:
    pass


@codec.register
@dataclasses.dataclass
class TrackingAreaUpdateRequest:
    pass
