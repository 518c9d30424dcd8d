/* Minimal libsamplerate header shim with inline no-op stubs.  sig_gen.c
 * only uses libsamplerate for its OPTIONAL external-modulation input
 * (a program piped into the generator); the golden-parity captures use
 * the plain carrier+noise mode, so the converter never runs.  Monitor's
 * clock tracking is NOT built through this shim.
 */
#ifndef SAMPLERATE_SHIM_H
#define SAMPLERATE_SHIM_H 1

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct SRC_STATE_tag SRC_STATE;
typedef struct {
  const float *data_in;
  float *data_out;
  long input_frames, output_frames;
  long input_frames_used, output_frames_gen;
  int end_of_input;
  double src_ratio;
} SRC_DATA;

typedef long (*src_callback_t)(void *cb_data, float **data);

enum { SRC_SINC_BEST_QUALITY = 0, SRC_SINC_MEDIUM_QUALITY = 1,
       SRC_SINC_FASTEST = 2, SRC_ZERO_ORDER_HOLD = 3, SRC_LINEAR = 4 };

static inline SRC_STATE *src_callback_new(src_callback_t f, int t, int c,
                                          int *error, void *cb) {
  (void)f; (void)t; (void)c; (void)cb;
  if (error) *error = 0;
  return (SRC_STATE *)0; /* callers treat NULL as "modulation unavailable" */
}
static inline SRC_STATE *src_delete(SRC_STATE *s) { (void)s; return 0; }
static inline long src_callback_read(SRC_STATE *s, double ratio, long frames,
                                     float *data) {
  (void)s; (void)ratio; (void)frames; (void)data;
  return 0;
}
/* push-mode API used by monitor-data.c's upsample() — implemented as a
 * real linear-interpolation resampler in samplerate_stub.c (only engaged
 * for streams not already at the 48 kHz DAC rate, monitor-data.c:731) */
SRC_STATE *src_new(int converter_type, int channels, int *error);
int src_set_ratio(SRC_STATE *state, double new_ratio);
int src_process(SRC_STATE *state, SRC_DATA *data);

static inline int src_error(SRC_STATE *s) { (void)s; return 0; }
static inline const char *src_strerror(int e) { (void)e; return "shim: libsamplerate absent"; }
static inline void src_short_to_float_array(const short *in, float *out, int len) {
  for (int i = 0; i < len; i++)
    out[i] = in[i] / 32768.0f;
}

#ifdef __cplusplus
}
#endif
#endif
