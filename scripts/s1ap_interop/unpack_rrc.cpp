// Cross-codec proof for the LIVE RRC wire: unpack bytes produced by
// stack/rrc_wire.py with the REFERENCE's generated 36.331 codec
// (rrc_asn1.cc), then re-pack and echo.  A "REPACK <name> <hex>" line
// equal to the input proves the reference parses our live messages
// field-for-field; "FAIL <name>" marks an unparseable input.
//
// stdin lines: "<channel> <name> <hex>" with channel one of
//   ul_ccch dl_ccch ul_dcch dl_dcch pcch bcch_dl_sch
#include "srslte/asn1/rrc_asn1.h"
#include <cstdio>
#include <cstring>
#include <string>

using namespace asn1;
using namespace asn1::rrc;

static int hex2bin(const char* hex, uint8_t* out) {
  int n = 0;
  while (hex[0] && hex[1]) {
    unsigned v;
    if (sscanf(hex, "%2x", &v) != 1) break;
    out[n++] = (uint8_t)v;
    hex += 2;
  }
  return n;
}

template <class MSG>
static void roundtrip(const char* name, uint8_t* in, int nbytes) {
  MSG m;
  bit_ref rd(in, nbytes);
  if (m.unpack(rd) != SRSASN_SUCCESS) {
    printf("FAIL %s unpack\n", name);
    return;
  }
  uint8_t out[1024];
  memset(out, 0, sizeof out);
  bit_ref wr(out, sizeof out);
  if (m.pack(wr) != SRSASN_SUCCESS) {
    printf("FAIL %s repack\n", name);
    return;
  }
  int outb = (wr.distance() + 7) / 8;
  printf("REPACK %s ", name);
  for (int i = 0; i < outb; ++i) printf("%02x", out[i]);
  printf("\n");
}

int main() {
  char chan[32], name[128], hex[2048];
  while (scanf("%31s %127s %2047s", chan, name, hex) == 3) {
    uint8_t buf[1024];
    int n = hex2bin(hex, buf);
    if (!strcmp(chan, "ul_ccch"))
      roundtrip<ul_ccch_msg_s>(name, buf, n);
    else if (!strcmp(chan, "dl_ccch"))
      roundtrip<dl_ccch_msg_s>(name, buf, n);
    else if (!strcmp(chan, "ul_dcch"))
      roundtrip<ul_dcch_msg_s>(name, buf, n);
    else if (!strcmp(chan, "dl_dcch"))
      roundtrip<dl_dcch_msg_s>(name, buf, n);
    else if (!strcmp(chan, "pcch"))
      roundtrip<pcch_msg_s>(name, buf, n);
    else if (!strcmp(chan, "bcch_dl_sch"))
      roundtrip<bcch_dl_sch_msg_s>(name, buf, n);
    else if (!strcmp(chan, "ue_cap"))
      // the UE-EUTRA-Capability rides OCTET-STRING containers on the
      // wire; round-trip the bare type for the capability-tree fuzz
      roundtrip<ue_eutra_cap_s>(name, buf, n);
    else
      printf("FAIL %s unknown-channel\n", name);
  }
  return 0;
}
