/* Minimal fftw3f API stub — just enough to compile and run the reference
 * receiver (acquire.c uses only forward out-of-place c2c plans of size
 * 2048/256).  Implemented by fftw_shim.c with a plain iterative radix-2
 * FFT.  This is OUR code, not FFTW's; only the 6 symbol names match. */
#pragma once
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Mirror FFTW's convention: after <complex.h>, fftwf_complex is the C99
 * complex type; otherwise a float[2].  The two are layout-compatible. */
#ifdef _Complex_I
typedef float _Complex fftwf_complex;
#else
typedef float fftwf_complex[2];
#endif
typedef struct fftwf_plan_s *fftwf_plan;

#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_ESTIMATE (1U << 6)

fftwf_complex *fftwf_alloc_complex(size_t n);
void fftwf_free(void *p);
fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags);
void fftwf_execute(fftwf_plan p);
void fftwf_destroy_plan(fftwf_plan p);

#ifdef __cplusplus
}
#endif
