/* Minimal libogg header shim: the public, ABI-stable ogg_page/ogg_packet
 * layouts plus an OVERSIZED opaque ogg_stream_state (the real struct is
 * ~360 bytes; callers only allocate it and pass pointers, so a larger
 * aligned blob is safe), linking the system libogg.so.0. Build-only aid
 * so the reference pcmrecord compiles without libogg-dev. */
#ifndef OGG_SHIM_H
#define OGG_SHIM_H 1

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int64_t ogg_int64_t;
typedef int32_t ogg_int32_t;
typedef uint32_t ogg_uint32_t;
typedef int16_t ogg_int16_t;

typedef struct {
  unsigned char *header;
  long header_len;
  unsigned char *body;
  long body_len;
} ogg_page;

typedef struct {
  unsigned char *packet;
  long bytes;
  long b_o_s;
  long e_o_s;
  ogg_int64_t granulepos;
  ogg_int64_t packetno;
} ogg_packet;

typedef struct {
  long double _opaque[64]; /* >= sizeof(real ogg_stream_state), aligned */
} ogg_stream_state;

int ogg_stream_init(ogg_stream_state *os, int serialno);
int ogg_stream_clear(ogg_stream_state *os);
int ogg_stream_reset(ogg_stream_state *os);
int ogg_stream_check(ogg_stream_state *os);
int ogg_stream_packetin(ogg_stream_state *os, ogg_packet *op);
int ogg_stream_pageout(ogg_stream_state *os, ogg_page *og);
int ogg_stream_flush(ogg_stream_state *os, ogg_page *og);
int ogg_page_eos(const ogg_page *og);

#ifdef __cplusplus
}
#endif
#endif
