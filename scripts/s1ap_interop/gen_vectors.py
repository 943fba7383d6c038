"""Emit our codec's hex PDUs for the liblte harness (one per line)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from srslte_emane_tpu.stack.asn1 import s1ap36413 as s1ap

tai = dict(plmn=b"\x00\xf1\x10", tac=b"\x00\x07")
cgi = dict(plmn=b"\x00\xf1\x10", cell_id=0x19B0100)
for m in [
    s1ap.initial_ue_message(42, b"\x07\x41\x01" + bytes(20), tai, cgi,
                            "mo-Signalling"),
    s1ap.downlink_nas_transport(0x01020304, 77, b"\x07\x52" + bytes(17)),
    s1ap.uplink_nas_transport(1, 2, b"\x07\x53\x08" + bytes(8), cgi, tai),
    s1ap.ue_context_release_command(123456, 654321, ("nas", 2)),
    s1ap.paging(b"\x1a", b"\xde\xad\xbe\xef", tai, "ps",
                ue_identity_index=0x2BB),
]:
    print(s1ap.encode_pdu(m).hex())
