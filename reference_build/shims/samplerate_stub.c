/* Linear-interpolation resampler behind the libsamplerate push API for
 * the headless stock-monitor build (monitor-data.c upsample()).  Only
 * engaged for sessions not already at the 48 kHz DAC rate; quality is
 * sufficient for the interop test's tone checks.  Original code.
 */
#include "samplerate.h"
#include <stdlib.h>
#include <string.h>

struct SRC_STATE_tag {
  int channels;
  double ratio;
  double frac;      /* fractional read position into the input */
  float last[2];    /* previous frame carried across calls */
  int have_last;
};

SRC_STATE *src_new(int converter_type, int channels, int *error) {
  (void)converter_type;
  if (channels < 1 || channels > 2) {
    if (error) *error = 1;
    return NULL;
  }
  SRC_STATE *s = calloc(1, sizeof *s);
  if (!s) {
    if (error) *error = 1;
    return NULL;
  }
  s->channels = channels;
  s->ratio = 1.0;
  if (error) *error = 0;
  return s;
}

int src_set_ratio(SRC_STATE *s, double new_ratio) {
  if (!s || new_ratio <= 0)
    return 1;
  s->ratio = new_ratio;
  return 0;
}

int src_process(SRC_STATE *s, SRC_DATA *d) {
  if (!s || !d || !d->data_in || !d->data_out)
    return 1;
  if (d->src_ratio > 0)
    s->ratio = d->src_ratio;
  const int ch = s->channels;
  const double step = 1.0 / s->ratio; /* input frames per output frame */
  long out = 0;
  /* virtual input stream: [last] + data_in, positions in (-1, n) */
  double pos = s->have_last ? s->frac - 1.0 : 0.0;
  while (out < d->output_frames) {
    long i0 = (long)(pos < 0 ? -1 : pos);
    if (i0 + 1 >= d->input_frames)
      break; /* need more input */
    double t = pos - (double)i0;
    for (int c = 0; c < ch; c++) {
      float a = i0 < 0 ? s->last[c] : d->data_in[i0 * ch + c];
      float b = d->data_in[(i0 + 1) * ch + c];
      d->data_out[out * ch + c] = (float)(a + t * (b - a));
    }
    pos += step;
    out++;
  }
  long used = d->input_frames; /* consume everything; carry the tail */
  if (used > 0) {
    for (int c = 0; c < ch; c++)
      s->last[c] = d->data_in[(used - 1) * ch + c];
    s->have_last = 1;
  }
  s->frac = pos - (double)(used - 1); /* position relative to carried frame */
  d->input_frames_used = used;
  d->output_frames_gen = out;
  return 0;
}
