// Cross-codec proof for the LIVE NAS wire: unpack bytes produced by
// stack/nas_wire.py with the REFERENCE's liblte_mme codec, re-pack, and
// echo.  "REPACK <name> <hex>" equal to the input proves liblte parses
// our live messages field-for-field.
//
// stdin: "<name> <hex>" lines of PLAIN (unciphered) NAS messages.
#include "srslte/asn1/liblte_mme.h"
#include <cstdio>
#include <cstring>

static int unhex(const char* s, uint8_t* out) {
  int n = 0;
  while (s[0] && s[1]) {
    unsigned v;
    if (sscanf(s, "%2x", &v) != 1) break;
    out[n++] = (uint8_t)v;
    s += 2;
  }
  return n;
}

static void emit(const char* name, LIBLTE_BYTE_MSG_STRUCT* m) {
  printf("REPACK %s ", name);
  for (uint32_t i = 0; i < m->N_bytes; ++i) printf("%02x", m->msg[i]);
  printf("\n");
}

// plain-NAS repack with explicit security-header args
#define RT_SEC(TYPE, UNPACK, PACK)                               \
  {                                                              \
    TYPE s;                                                      \
    memset(&s, 0, sizeof s);                                     \
    if (UNPACK(&in, &s) != LIBLTE_SUCCESS) {                     \
      printf("FAIL %s unpack\n", name);                          \
      break;                                                     \
    }                                                            \
    LIBLTE_BYTE_MSG_STRUCT out;                                  \
    if (PACK(&s, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0,      \
             &out) != LIBLTE_SUCCESS) {                          \
      printf("FAIL %s repack\n", name);                          \
      break;                                                     \
    }                                                            \
    emit(name, &out);                                            \
  }                                                              \
  break;
#define RT(TYPE, UNPACK, PACK)                                   \
  {                                                              \
    TYPE s;                                                      \
    memset(&s, 0, sizeof s);                                     \
    if (UNPACK(&in, &s) != LIBLTE_SUCCESS) {                     \
      printf("FAIL %s unpack\n", name);                          \
      break;                                                     \
    }                                                            \
    LIBLTE_BYTE_MSG_STRUCT out;                                  \
    if (PACK(&s, &out) != LIBLTE_SUCCESS) {                      \
      printf("FAIL %s repack\n", name);                          \
      break;                                                     \
    }                                                            \
    emit(name, &out);                                            \
  }                                                              \
  break;

int main() {
  char name[128], hex[4096];
  while (scanf("%127s %4095s", name, hex) == 2) {
    LIBLTE_BYTE_MSG_STRUCT in;
    in.N_bytes = unhex(hex, in.msg);
    uint8_t pd = 0, mt = 0;
    if (liblte_mme_parse_msg_header(&in, &pd, &mt) != LIBLTE_SUCCESS) {
      printf("FAIL %s header\n", name);
      continue;
    }
    switch (mt) {
      case LIBLTE_MME_MSG_TYPE_ATTACH_REQUEST:
        RT(LIBLTE_MME_ATTACH_REQUEST_MSG_STRUCT,
           liblte_mme_unpack_attach_request_msg,
           liblte_mme_pack_attach_request_msg)
      case LIBLTE_MME_MSG_TYPE_ATTACH_ACCEPT: {
        LIBLTE_MME_ATTACH_ACCEPT_MSG_STRUCT s;
        memset(&s, 0, sizeof s);
        if (liblte_mme_unpack_attach_accept_msg(&in, &s) !=
            LIBLTE_SUCCESS) {
          printf("FAIL %s unpack\n", name);
          break;
        }
        LIBLTE_BYTE_MSG_STRUCT out;
        if (liblte_mme_pack_attach_accept_msg(
                &s, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out) !=
            LIBLTE_SUCCESS) {
          printf("FAIL %s repack\n", name);
          break;
        }
        emit(name, &out);
        break;
      }
      case LIBLTE_MME_MSG_TYPE_ATTACH_COMPLETE:
        RT_SEC(LIBLTE_MME_ATTACH_COMPLETE_MSG_STRUCT,
               liblte_mme_unpack_attach_complete_msg,
               liblte_mme_pack_attach_complete_msg)
      case LIBLTE_MME_MSG_TYPE_AUTHENTICATION_RESPONSE:
        RT_SEC(LIBLTE_MME_AUTHENTICATION_RESPONSE_MSG_STRUCT,
               liblte_mme_unpack_authentication_response_msg,
               liblte_mme_pack_authentication_response_msg)
      case LIBLTE_MME_MSG_TYPE_AUTHENTICATION_FAILURE:
        RT(LIBLTE_MME_AUTHENTICATION_FAILURE_MSG_STRUCT,
           liblte_mme_unpack_authentication_failure_msg,
           liblte_mme_pack_authentication_failure_msg)
      case LIBLTE_MME_MSG_TYPE_IDENTITY_RESPONSE:
        RT_SEC(LIBLTE_MME_ID_RESPONSE_MSG_STRUCT,
               liblte_mme_unpack_identity_response_msg,
               liblte_mme_pack_identity_response_msg)
      case LIBLTE_MME_MSG_TYPE_DETACH_REQUEST: {
        LIBLTE_MME_DETACH_REQUEST_MSG_STRUCT s;
        memset(&s, 0, sizeof s);
        if (liblte_mme_unpack_detach_request_msg(&in, &s) !=
            LIBLTE_SUCCESS) {
          printf("FAIL %s unpack\n", name);
          break;
        }
        LIBLTE_BYTE_MSG_STRUCT out;
        if (liblte_mme_pack_detach_request_msg(
                &s, LIBLTE_MME_SECURITY_HDR_TYPE_PLAIN_NAS, 0, &out) !=
            LIBLTE_SUCCESS) {
          printf("FAIL %s repack\n", name);
          break;
        }
        emit(name, &out);
        break;
      }
      default:
        printf("SKIP %s type=0x%02x\n", name, mt);
    }
  }
  return 0;
}
