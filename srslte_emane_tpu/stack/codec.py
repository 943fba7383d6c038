"""Compact tagged serialization for control-plane messages.

The reference carries RRC/NAS/S1AP as ASN.1 UPER/APER (lib/src/asn1, 170k+
generated LoC).  This framework uses explicit dataclass schemas with a
deterministic byte codec; a 36.331-subset PER codec is a later-round item
(the message *content* and procedure flows are the capability being matched).
"""

from __future__ import annotations

import dataclasses
import json


_REGISTRY: dict = {}


def register(cls):
    """Class decorator: make a dataclass wire-codable."""
    _REGISTRY[cls.__name__] = cls
    return cls


def _to_jsonable(v):
    if isinstance(v, bytes):
        return {"__b": v.hex()}
    if dataclasses.is_dataclass(v):
        return {"__t": type(v).__name__,
                "f": {f.name: _to_jsonable(getattr(v, f.name))
                      for f in dataclasses.fields(v)}}
    if isinstance(v, dict):
        return {k: _to_jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_to_jsonable(x) for x in v]
    return v


def _from_jsonable(v):
    if isinstance(v, dict):
        if "__b" in v:
            return bytes.fromhex(v["__b"])
        if "__t" in v:
            cls = _REGISTRY[v["__t"]]
            kw = {k: _from_jsonable(x) for k, x in v["f"].items()}
            return cls(**kw)
        return {k: _from_jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_from_jsonable(x) for x in v]
    return v


def encode(msg) -> bytes:
    return json.dumps(_to_jsonable(msg), separators=(",", ":")).encode()


def decode(data: bytes):
    return _from_jsonable(json.loads(data.decode()))
