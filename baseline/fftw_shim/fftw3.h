/* Minimal FFTW3 API shim — just enough to build and benchmark the
 * reference C library on a host without libfftw3. Only the subset used by
 * the reference's tempo analyzer is provided (double-precision 1-D r2c).
 * Backed by an iterative radix-2 complex FFT (see fftw_shim.c). */
#ifndef FFTW3_SHIM_H_
#define FFTW3_SHIM_H_

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef double fftw_complex[2];
typedef struct fftw_plan_s *fftw_plan;

#define FFTW_ESTIMATE (1U << 6)
#define FFTW_MEASURE (0U)

fftw_plan fftw_plan_dft_r2c_1d(int n, double *in, fftw_complex *out,
                               unsigned flags);
void fftw_execute(const fftw_plan p);
void fftw_destroy_plan(fftw_plan p);
void fftw_cleanup(void);
void *fftw_malloc(size_t n);
void fftw_free(void *p);

#ifdef __cplusplus
}
#endif

#endif /* FFTW3_SHIM_H_ */
