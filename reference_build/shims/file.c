// file.so — raw-capture playback front end for the REFERENCE radiod,
// loaded through its documented dlopen plugin seam (radio.c:568-637:
// PKGLIBDIR/<device>.so, symbols <device>_setup/_startup/_shutdown).
//
// Original test scaffolding (NOT reference code): it exists so the golden
// parity captures can hold demodulators the reference's own sig_gen cannot
// exercise — sig_gen's FM modulation path is unimplemented upstream
// (sig_gen.c:291,321 "FM to be implemented"), so a WFM stereo composite
// must be synthesized offline (float32 I/Q file) and played back at the
// virtual A/D rate. Config keys mirror ka9q_radio_tpu's `device = file`
// front end (config/loader.py) so the SAME ini drives both daemons:
//
//   [rf]
//   device = file
//   path = /tmp/composite.cf32     ; raw float32 (interleaved I/Q if complex)
//   samprate = 768k
//   format = cf32le                ; cf32le (complex) | f32le (real)
//   loop = yes
//   frequency = 100m               ; center the capture was made at
//
// Samples are floating point at natural full-scale-1.0 units
// (bitspersample = 1, the sig_gen convention: "floating point with no
// scaling"), paced against the wall clock exactly like proc_sig_gen so
// radiod's downstream timing behaves as with any live front end.
#include <assert.h>
#include <complex.h>
#include <math.h>
#include <pthread.h>
#include <stdatomic.h>
#include <stdbool.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <strings.h>
#include <unistd.h>
#include <iniparser/iniparser.h>
#include <bsd/string.h>

#include "misc.h"
#include "config.h"
#include "radio.h"

enum fstate { F_STOPPED = 0, F_STARTING, F_RUNNING, F_STOPPING };

struct filestate {
  struct frontend *frontend;
  FILE *fp;
  char *path;
  bool loop;
  bool complex_file;
  double scale;
  _Atomic enum fstate state;
  pthread_t thread;
};

static float const Power_smooth = 0.05f;

int file_setup(struct frontend *const frontend, dictionary const *const dictionary,
               char const *const section) {
  char const *device = config_getstring(dictionary, section, "device", section);
  if (strcasecmp(device, "file") != 0)
    return -1;

  struct filestate *const fs = calloc(1, sizeof *fs);
  assert(fs != NULL);
  fs->frontend = frontend;
  frontend->context = fs;

  char const *path = config_getstring(dictionary, section, "path", NULL);
  if (path == NULL) {
    fprintf(stderr, "file front end: 'path' required\n");
    return -1;
  }
  fs->path = strdup(path);
  fs->loop = config_getboolean(dictionary, section, "loop", false);

  frontend->samprate = 768000;
  {
    char const *p = config_getstring(dictionary, section, "samprate", NULL);
    if (p != NULL)
      frontend->samprate = parse_frequency(p, false);
  }
  char const *fmt = config_getstring(dictionary, section, "format", "cf32le");
  fs->complex_file = (fmt[0] == 'c');
  if (strcmp(fmt, "cf32le") != 0 && strcmp(fmt, "f32le") != 0) {
    fprintf(stderr, "file front end: only cf32le/f32le formats supported, got %s\n", fmt);
    return -1;
  }
  frontend->isreal = !fs->complex_file;
  frontend->bitspersample = 1; // floating point, no scaling (sig_gen convention)
  frontend->rf_gain = NAN;
  frontend->rf_atten = NAN;
  frontend->rf_level_cal = NAN;
  frontend->lock = true;
  if (frontend->isreal) {
    frontend->min_IF = 0;
    frontend->max_IF = 0.5 * frontend->samprate;
    frontend->frequency = 0;
  } else {
    frontend->min_IF = -0.5 * frontend->samprate;
    frontend->max_IF = +0.5 * frontend->samprate;
    frontend->frequency = 0.5 * frontend->samprate; // sig_gen's complex default
  }
  {
    char const *p = config_getstring(dictionary, section, "frequency", NULL);
    if (p != NULL)
      frontend->frequency = parse_frequency(p, false);
  }
  {
    char const *p = config_getstring(dictionary, section, "description", "file playback");
    strlcpy(frontend->description, p, sizeof(frontend->description));
  }
  fs->fp = fopen(fs->path, "rb");
  if (fs->fp == NULL) {
    fprintf(stderr, "file front end: cannot open %s\n", fs->path);
    return -1;
  }
  fprintf(stderr, "file front end: %s, %s %.0f Hz, center %.3f Hz, loop %d\n",
          fs->path, frontend->isreal ? "real" : "complex", frontend->samprate,
          frontend->frequency, (int)fs->loop);
  return 0;
}

// Fill dst with n frames (1 or 2 floats each); zero-fill past EOF when not
// looping so radiod keeps cadence on silence instead of stalling.
static long read_frames(struct filestate *fs, float *dst, long n) {
  size_t const w = fs->complex_file ? 2 : 1;
  long got = 0;
  int rewound_dry = 0; // loop=yes on an empty/unreadable file: one dry
                       // rewind is allowed (read position at exact EOF);
                       // a second with zero progress means no data will
                       // ever come — zero-fill instead of spinning forever
  while (got < n) {
    size_t r = fread(dst + got * w, sizeof(float) * w, n - got, fs->fp);
    got += (long)r;
    if (r > 0)
      rewound_dry = 0;
    if (got < n) {
      if (fs->loop && !rewound_dry) {
        rewind(fs->fp);
        rewound_dry = 1;
      } else {
        memset(dst + got * w, 0, (n - got) * w * sizeof(float));
        return n;
      }
    }
  }
  return n;
}

static void *proc_file(void *arg) {
  pthread_setname("proc_file");
  struct filestate *const fs = (struct filestate *)arg;
  struct frontend *const frontend = fs->frontend;

  long const output_size = lrint(1.5 * Blocktime * frontend->samprate);
  float *buf = malloc((fs->complex_file ? 2 : 1) * output_size * sizeof(float));
  assert(buf != NULL);
  int64_t timesnap = gps_time_ns() - lrint(Blocktime * 1e9);

  enum fstate s;
  while ((s = atomic_load(&fs->state)) == F_RUNNING || s == F_STARTING) {
    int64_t const now = gps_time_ns();
    int64_t interval = now - timesnap;
    long blocksize = lrint((interval * frontend->samprate) / 1e9);
    if (blocksize > output_size)
      blocksize = output_size;
    interval = llrint(1e9 * blocksize / frontend->samprate);
    timesnap += interval;

    read_frames(fs, buf, blocksize);
    double in_energy = 0;
    if (frontend->isreal) {
      float *wptr = frontend->in.input_write_pointer.r;
      for (long i = 0; i < blocksize; i++) {
        in_energy += (double)buf[i] * buf[i];
        wptr[i] = buf[i];
      }
      int r = write_rfilter(&frontend->in, NULL, blocksize);
      assert(r != -1);
      (void)r;
    } else {
      float complex *wptr = frontend->in.input_write_pointer.c;
      for (long i = 0; i < blocksize; i++) {
        float const re = buf[2 * i], im = buf[2 * i + 1];
        in_energy += (double)re * re + (double)im * im;
        wptr[i] = re + im * I;
      }
      int r = write_cfilter(&frontend->in, NULL, blocksize);
      assert(r != -1);
      (void)r;
    }
    frontend->samples += blocksize;
    if (blocksize != 0 && isfinite(in_energy))
      frontend->if_power += Power_smooth * (in_energy / blocksize - frontend->if_power);
    struct timespec ts = {.tv_sec = 0, .tv_nsec = 5000000}; // 5 ms pace
    nanosleep(&ts, NULL);
  }
  free(buf);
  return NULL;
}

int file_startup(struct frontend *frontend) {
  struct filestate *const fs = (struct filestate *)frontend->context;
  assert(fs != NULL);
  enum fstate expect = F_STOPPED;
  if (!atomic_compare_exchange_strong(&fs->state, &expect, F_STARTING))
    return 0;
  pthread_create(&fs->thread, NULL, proc_file, fs);
  atomic_store(&fs->state, F_RUNNING);
  fprintf(stderr, "file playback running\n");
  return 0;
}

int file_shutdown(struct frontend *frontend) {
  struct filestate *const fs = (struct filestate *)frontend->context;
  assert(fs != NULL);
  enum fstate expect = F_RUNNING;
  if (!atomic_compare_exchange_strong(&fs->state, &expect, F_STOPPING))
    return 0;
  pthread_join(fs->thread, NULL);
  atomic_store(&fs->state, F_STOPPED);
  if (fs->fp)
    fclose(fs->fp);
  return 0;
}
