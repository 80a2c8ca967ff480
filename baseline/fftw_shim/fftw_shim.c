/* Double-precision 1-D real-to-complex DFT with the FFTW3 calling
 * convention, implemented as an iterative radix-2 Cooley-Tukey transform
 * with precomputed twiddles. Power-of-two sizes only (the reference uses
 * 512). Unscaled forward transform, identical to FFTW's r2c semantics. */

#include "fftw3.h"

#include <math.h>
#include <stdlib.h>
#include <string.h>

struct fftw_plan_s {
  int n;
  double *in;
  fftw_complex *out;
  double *tw_re; /* n/2 twiddles */
  double *tw_im;
  int *rev;     /* bit-reversal permutation */
  double *work; /* 2*n scratch (interleaved complex) */
};

fftw_plan fftw_plan_dft_r2c_1d(int n, double *in, fftw_complex *out,
                               unsigned flags) {
  (void)flags;
  if (n <= 0 || (n & (n - 1)) != 0) return NULL; /* power of two only */
  fftw_plan p = malloc(sizeof(*p));
  p->n = n;
  p->in = in;
  p->out = out;
  p->tw_re = malloc(sizeof(double) * (n / 2));
  p->tw_im = malloc(sizeof(double) * (n / 2));
  p->rev = malloc(sizeof(int) * n);
  p->work = malloc(sizeof(double) * 2 * n);
  for (int k = 0; k < n / 2; ++k) {
    double ang = -2.0 * M_PI * k / n;
    p->tw_re[k] = cos(ang);
    p->tw_im[k] = sin(ang);
  }
  int bits = 0;
  while ((1 << bits) < n) ++bits;
  for (int i = 0; i < n; ++i) {
    int r = 0;
    for (int b = 0; b < bits; ++b) r |= ((i >> b) & 1) << (bits - 1 - b);
    p->rev[i] = r;
  }
  return p;
}

void fftw_execute(const fftw_plan p) {
  const int n = p->n;
  double *w = p->work;
  /* bit-reversed load of the real input as complex */
  for (int i = 0; i < n; ++i) {
    w[2 * p->rev[i]] = p->in[i];
    w[2 * p->rev[i] + 1] = 0.0;
  }
  for (int len = 2; len <= n; len <<= 1) {
    int half = len >> 1;
    int step = n / len;
    for (int base = 0; base < n; base += len) {
      for (int k = 0; k < half; ++k) {
        double wr = p->tw_re[k * step];
        double wi = p->tw_im[k * step];
        double *a = w + 2 * (base + k);
        double *b = w + 2 * (base + k + half);
        double tr = b[0] * wr - b[1] * wi;
        double ti = b[0] * wi + b[1] * wr;
        b[0] = a[0] - tr;
        b[1] = a[1] - ti;
        a[0] += tr;
        a[1] += ti;
      }
    }
  }
  for (int k = 0; k <= n / 2; ++k) {
    p->out[k][0] = w[2 * k];
    p->out[k][1] = w[2 * k + 1];
  }
}

void fftw_destroy_plan(fftw_plan p) {
  if (!p) return;
  free(p->tw_re);
  free(p->tw_im);
  free(p->rev);
  free(p->work);
  free(p);
}

void fftw_cleanup(void) {}

void *fftw_malloc(size_t n) { return malloc(n); }
void fftw_free(void *p) { free(p); }
