/* Iterative radix-2 Cooley-Tukey FFT behind the fftw3f API subset the
 * reference receiver uses (see fftw3.h in this directory).  Unnormalized,
 * FFTW sign convention (FFTW_FORWARD = exp(-2*pi*i*k*n/N)).  Sizes are
 * powers of two only (2048 FM / 256 AM per reference src/defines.h). */
#include "fftw3.h"
#include <math.h>
#include <stdlib.h>

struct fftwf_plan_s {
    int n;
    int sign;
    fftwf_complex *in;
    fftwf_complex *out;
    unsigned *rev;    /* bit-reversal permutation */
    float *tw;        /* twiddles, interleaved re/im, n/2 entries */
};

fftwf_complex *fftwf_alloc_complex(size_t n)
{
    return (fftwf_complex *)calloc(n, sizeof(fftwf_complex));
}

void fftwf_free(void *p) { free(p); }

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags)
{
    (void)flags;
    struct fftwf_plan_s *p = calloc(1, sizeof(*p));
    p->n = n;
    p->sign = sign;
    p->in = in;
    p->out = out;
    p->rev = malloc(sizeof(unsigned) * n);
    p->tw = malloc(sizeof(float) * n); /* n/2 complex */
    int bits = 0;
    while ((1 << bits) < n)
        bits++;
    for (int i = 0; i < n; i++)
    {
        unsigned r = 0;
        for (int b = 0; b < bits; b++)
            r |= ((i >> b) & 1u) << (bits - 1 - b);
        p->rev[i] = r;
    }
    for (int k = 0; k < n / 2; k++)
    {
        double ang = (double)sign * 2.0 * M_PI * k / n;
        p->tw[2 * k] = (float)cos(ang);
        p->tw[2 * k + 1] = (float)sin(ang);
    }
    return p;
}

void fftwf_execute(fftwf_plan p)
{
    const int n = p->n;
    fftwf_complex *out = p->out;
    for (int i = 0; i < n; i++)
    {
        out[p->rev[i]][0] = p->in[i][0];
        out[p->rev[i]][1] = p->in[i][1];
    }
    for (int len = 2; len <= n; len <<= 1)
    {
        int half = len >> 1;
        int step = n / len; /* twiddle stride */
        for (int base = 0; base < n; base += len)
        {
            for (int j = 0; j < half; j++)
            {
                float wr = p->tw[2 * (j * step)];
                float wi = p->tw[2 * (j * step) + 1];
                float *a = out[base + j];
                float *b = out[base + j + half];
                float tr = b[0] * wr - b[1] * wi;
                float ti = b[0] * wi + b[1] * wr;
                b[0] = a[0] - tr;
                b[1] = a[1] - ti;
                a[0] += tr;
                a[1] += ti;
            }
        }
    }
}

void fftwf_destroy_plan(fftwf_plan p)
{
    if (!p)
        return;
    free(p->rev);
    free(p->tw);
    free(p);
}
