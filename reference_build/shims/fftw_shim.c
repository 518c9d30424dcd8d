/* Table-driven recursive mixed-radix FFT implementing the fftw3.h shim.
 *
 * Double precision internally, float at the edges, per-length twiddle
 * tables (both signs) shared via a small cache.  The combine loops use
 * incremental twiddle indices (no per-element modulo) and a preallocated
 * scratch arena (no malloc in the hot path).  Complex transforms of any
 * length (naive DFT below the radix cutoff and for prime factors);
 * r2c/c2r ride the complex path.  Fast enough for real-time radiod at
 * ~1 Msps master rates, which is all the golden-parity capture needs.
 */
#include "fftw3.h"

#include <complex.h>
#include <math.h>
#include <pthread.h>
#include <stdlib.h>
#include <string.h>

typedef double complex cplx;

struct twtab {
  int n;
  cplx *w[2]; /* w[0][j] = exp(-2*pi*i*j/n) (forward); w[1] = conj */
  struct twtab *next;
};

static struct twtab *Tw_cache;
static pthread_mutex_t Cache_lock = PTHREAD_MUTEX_INITIALIZER;

static struct twtab *get_twtab(int n) {
  pthread_mutex_lock(&Cache_lock);
  struct twtab *t;
  for (t = Tw_cache; t; t = t->next)
    if (t->n == n)
      goto done;
  t = malloc(sizeof *t);
  t->n = n;
  t->w[0] = malloc(n * sizeof(cplx));
  t->w[1] = malloc(n * sizeof(cplx));
  for (int j = 0; j < n; j++) {
    t->w[0][j] = cexp(-2.0 * M_PI * I * ((double)j / n));
    t->w[1][j] = conj(t->w[0][j]);
  }
  t->next = Tw_cache;
  Tw_cache = t;
done:
  pthread_mutex_unlock(&Cache_lock);
  return t;
}

static int smallest_factor(int n) {
  for (int p = 2; (long)p * p <= n; p++)
    if (n % p == 0)
      return p;
  return n;
}

/* DFT of in[0..n) with input stride `instride`.  w = length-N table for
 * the wanted sign; wstep = N/n.  scratch: >= 2n entries, caller-owned. */
static void fft_rec(cplx *restrict out, const cplx *restrict in, int n,
                    long instride, const cplx *restrict w, long wstep, long N,
                    cplx *restrict scratch) {
  const int p0 = smallest_factor(n);
  if (n <= 32 || p0 == n) { /* naive DFT (small sizes and prime factors) */
    for (int k = 0; k < n; k++) {
      const long step = (long)k * wstep; /* < N */
      long idx = 0;
      cplx acc = 0;
      const cplx *ip = in;
      for (int j = 0; j < n; j++) {
        acc += *ip * w[idx];
        ip += instride;
        idx += step;
        if (idx >= N)
          idx -= N;
      }
      out[k] = acc;
    }
    return;
  }
  const int p = p0;
  const int m = n / p;
  cplx *tmp = scratch;
  for (int q = 0; q < p; q++) /* p sub-DFTs over x[q::p] */
    fft_rec(tmp + (long)q * m, in + (long)q * instride, m, instride * p, w,
            wstep * p, N, scratch + n);
  /* combine: out[k] = sum_q W_N^{q*k*wstep} * S_q[k mod m] */
  for (int j = 0; j < p; j++)
    memcpy(out + (long)j * m, tmp, m * sizeof(cplx)); /* q = 0 term */
  for (int q = 1; q < p; q++) {
    const cplx *restrict s = tmp + (long)q * m;
    const long step = (long)q * wstep; /* < N since q < n */
    long idx = 0;
    cplx *restrict o = out;
    for (int j = 0; j < p; j++) {
      for (int r = 0; r < m; r++) {
        *o++ += s[r] * w[idx];
        idx += step;
        if (idx >= N)
          idx -= N;
      }
    }
  }
}

struct fftwf_plan_s {
  int n;
  int sign; /* FFTW_FORWARD/BACKWARD for c2c */
  int kind; /* 0 = c2c, 1 = r2c, 2 = c2r */
  float *rin;
  float *rout;
  fftwf_complex *cin;
  fftwf_complex *cout;
  struct twtab *t;
  cplx *buf;     /* 2n: in + out staging */
  cplx *scratch; /* 2n: recursion arena */
  pthread_mutex_t lock; /* plans are shared across radiod threads */
};

static void run_core(struct fftwf_plan_s *p, const cplx *a, cplx *b, int sign) {
  fft_rec(b, a, p->n, 1, p->t->w[sign < 0 ? 0 : 1], 1, p->n, p->scratch);
}

static void run_c2c(struct fftwf_plan_s *p, const fftwf_complex *in, fftwf_complex *out) {
  const int n = p->n;
  pthread_mutex_lock(&p->lock);
  cplx *a = p->buf, *b = p->buf + n;
  for (int i = 0; i < n; i++)
    a[i] = in[i][0] + I * (double)in[i][1];
  run_core(p, a, b, p->sign);
  for (int i = 0; i < n; i++) {
    out[i][0] = (float)creal(b[i]);
    out[i][1] = (float)cimag(b[i]);
  }
  pthread_mutex_unlock(&p->lock);
}

static void run_r2c(struct fftwf_plan_s *p, const float *in, fftwf_complex *out) {
  const int n = p->n;
  pthread_mutex_lock(&p->lock);
  cplx *a = p->buf, *b = p->buf + n;
  for (int i = 0; i < n; i++)
    a[i] = in[i];
  run_core(p, a, b, -1);
  for (int i = 0; i <= n / 2; i++) {
    out[i][0] = (float)creal(b[i]);
    out[i][1] = (float)cimag(b[i]);
  }
  pthread_mutex_unlock(&p->lock);
}

static void run_c2r(struct fftwf_plan_s *p, const fftwf_complex *in, float *out) {
  const int n = p->n;
  pthread_mutex_lock(&p->lock);
  cplx *a = p->buf, *b = p->buf + n;
  for (int i = 0; i <= n / 2; i++)
    a[i] = in[i][0] + I * (double)in[i][1];
  for (int i = n / 2 + 1; i < n; i++)
    a[i] = conj(a[n - i]);
  run_core(p, a, b, +1); /* unnormalized inverse, like FFTW */
  for (int i = 0; i < n; i++)
    out[i] = (float)creal(b[i]);
  pthread_mutex_unlock(&p->lock);
}

static fftwf_plan mkplan(int n, int kind, int sign) {
  struct fftwf_plan_s *p = calloc(1, sizeof *p);
  p->n = n;
  p->kind = kind;
  p->sign = sign;
  p->t = get_twtab(n);
  p->buf = malloc((size_t)2 * n * sizeof(cplx));
  p->scratch = malloc((size_t)2 * n * sizeof(cplx));
  pthread_mutex_init(&p->lock, NULL);
  return p;
}

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out, int sign, unsigned flags) {
  (void)flags;
  fftwf_plan p = mkplan(n, 0, sign);
  p->cin = in;
  p->cout = out;
  return p;
}
fftwf_plan fftwf_plan_dft_r2c_1d(int n, float *in, fftwf_complex *out, unsigned flags) {
  (void)flags;
  fftwf_plan p = mkplan(n, 1, -1);
  p->rin = in;
  p->cout = out;
  return p;
}
fftwf_plan fftwf_plan_dft_c2r_1d(int n, fftwf_complex *in, float *out, unsigned flags) {
  (void)flags;
  fftwf_plan p = mkplan(n, 2, +1);
  p->cin = in;
  p->rout = out;
  return p;
}

void fftwf_execute(const fftwf_plan p0) {
  struct fftwf_plan_s *p = (struct fftwf_plan_s *)p0;
  switch (p->kind) {
  case 0: run_c2c(p, p->cin, p->cout); break;
  case 1: run_r2c(p, p->rin, p->cout); break;
  case 2: run_c2r(p, p->cin, p->rout); break;
  }
}
void fftwf_execute_dft(const fftwf_plan p, fftwf_complex *in, fftwf_complex *out) {
  run_c2c((struct fftwf_plan_s *)p, in, out);
}
void fftwf_execute_dft_r2c(const fftwf_plan p, float *in, fftwf_complex *out) {
  run_r2c((struct fftwf_plan_s *)p, in, out);
}
void fftwf_execute_dft_c2r(const fftwf_plan p, fftwf_complex *in, float *out) {
  run_c2r((struct fftwf_plan_s *)p, in, out);
}
void fftwf_destroy_plan(fftwf_plan p0) {
  struct fftwf_plan_s *p = (struct fftwf_plan_s *)p0;
  if (!p)
    return;
  free(p->buf);
  free(p->scratch);
  free(p);
}

void *fftwf_malloc(size_t n) { void *p = NULL; if (posix_memalign(&p, 64, n)) return NULL; return p; }
void fftwf_free(void *p) { free(p); }
float *fftwf_alloc_real(size_t n) { return fftwf_malloc(n * sizeof(float)); }
fftwf_complex *fftwf_alloc_complex(size_t n) { return fftwf_malloc(n * sizeof(fftwf_complex)); }

int fftwf_import_system_wisdom(void) { return 0; }
int fftwf_import_wisdom_from_filename(const char *fn) { (void)fn; return 0; }
int fftwf_export_wisdom_to_filename(const char *fn) { (void)fn; return 1; }
char *fftwf_export_wisdom_to_string(void) { return strdup("(shim)"); }
void fftwf_forget_wisdom(void) {}
int fftwf_init_threads(void) { return 1; }
void fftwf_plan_with_nthreads(int n) { (void)n; }
void fftwf_cleanup_threads(void) {}
void fftwf_set_timelimit(double t) { (void)t; }
void fftwf_make_planner_thread_safe(void) {}

const char fftwf_version[] = "fftw-3.x-shim";
