// Minimal FFTW3 (float) shim so the reference's OFDM demodulator compiles
// on this image (no fftw3 package exists here; vcpkg deps are unfetchable).
// Test-oracle infrastructure only — implements exactly the four symbols
// ofdm_demodulator.cpp uses (fftwf_plan_dft_1d / fftwf_execute_dft /
// fftwf_destroy_plan and the fftwf_complex type) with a double-precision
// iterative radix-2 DFT. Semantics match FFTW: FFTW_FORWARD = exp(-i2πkn/N),
// unnormalized in both directions. DAB FFT sizes are powers of two in every
// transmission mode (2048/512/256/1024), so radix-2 covers all of them.
#pragma once

#include <cmath>
#include <cstdlib>
#include <vector>

typedef float fftwf_complex[2];

struct fftwf_plan_s {
    int n;
    int sign;
};
typedef fftwf_plan_s* fftwf_plan;

#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_ESTIMATE (1U << 6)

inline fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex* /*in*/,
                                    fftwf_complex* /*out*/, int sign,
                                    unsigned /*flags*/) {
    fftwf_plan p = new fftwf_plan_s();
    p->n = n;
    p->sign = sign;
    return p;
}

inline void fftwf_destroy_plan(fftwf_plan p) { delete p; }

inline void fftwf_execute_dft(const fftwf_plan p, fftwf_complex* in,
                              fftwf_complex* out) {
    const int n = p->n;
    int lg = 0;
    while ((1 << lg) < n) lg++;
    thread_local std::vector<double> re, im;
    re.resize(n);
    im.resize(n);
    // bit-reversed copy (reads all of `in` first: in==out aliasing safe)
    for (int i = 0; i < n; i++) {
        unsigned j = 0, v = (unsigned)i;
        for (int b = 0; b < lg; b++) {
            j = (j << 1) | (v & 1);
            v >>= 1;
        }
        re[j] = in[i][0];
        im[j] = in[i][1];
    }
    const double s = (p->sign == FFTW_FORWARD) ? -1.0 : 1.0;
    for (int len = 2; len <= n; len <<= 1) {
        const double ang = s * 2.0 * M_PI / (double)len;
        for (int base = 0; base < n; base += len) {
            for (int k = 0; k < len / 2; k++) {
                // direct per-k twiddles: accuracy over speed (test oracle)
                const double wr = std::cos(ang * k), wi = std::sin(ang * k);
                const int a = base + k, b = base + k + len / 2;
                const double tr = re[b] * wr - im[b] * wi;
                const double ti = re[b] * wi + im[b] * wr;
                re[b] = re[a] - tr;
                im[b] = im[a] - ti;
                re[a] += tr;
                im[a] += ti;
            }
        }
    }
    for (int i = 0; i < n; i++) {
        out[i][0] = (float)re[i];
        out[i][1] = (float)im[i];
    }
}
