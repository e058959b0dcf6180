// FFT convention probe: dump r2c / c2r / c2c results + minimum phase +
// the raw randn() stream so the JAX port can pin exact semantics.
#include <cstdio>
#include <cmath>
#include "world_fft.hpp"
#include "world_common.hpp"
#include "world_matlabfunctions.hpp"

static void wr(FILE* fp, const double* p, int n) { fwrite(p, 8, n, fp); }

int main() {
    const int n = 16;
    double x[n];
    for (int i = 0; i < n; ++i) x[i] = sin(0.7 * i) + 0.3 * i;

    FILE* fp = fopen("probe.bin", "wb");
    wr(fp, x, n);

    // r2c
    fft_complex spec[n / 2 + 1];
    fft_plan fwd = fft_plan_dft_r2c_1d(n, x, spec, FFT_ESTIMATE);
    fft_execute(fwd);
    wr(fp, (double*)spec, 2 * (n / 2 + 1));

    // c2r of that spectrum
    double xr[n];
    fft_plan bwd = fft_plan_dft_c2r_1d(n, spec, xr, FFT_ESTIMATE);
    fft_execute(bwd);
    wr(fp, xr, n);

    // c2c forward and backward of a complex ramp
    fft_complex cin[n], cf[n], cb[n];
    for (int i = 0; i < n; ++i) { cin[i][0] = cos(0.3 * i); cin[i][1] = 0.1 * i; }
    fft_plan pf = fft_plan_dft_1d(n, cin, cf, FFT_FORWARD, FFT_ESTIMATE);
    fft_execute(pf);
    wr(fp, (double*)cf, 2 * n);
    fft_plan pb = fft_plan_dft_1d(n, cin, cb, FFT_BACKWARD, FFT_ESTIMATE);
    fft_execute(pb);
    wr(fp, (double*)cb, 2 * n);

    // minimum phase for a smooth log spectrum, fft_size=32
    const int m = 32;
    MinimumPhaseAnalysis mp;
    mp.initialize(m);
    for (int i = 0; i <= m / 2; ++i) mp.log_spectrum[i] = -0.5 + 0.1 * sin(0.4 * i);
    mp.compute();
    wr(fp, (double*)mp.minimum_phase_spectrum, 2 * m);

    // first 64 randn values
    double r[64];
    for (int i = 0; i < 64; ++i) r[i] = randn();
    wr(fp, r, 64);

    fclose(fp);
    printf("probe ok\n");
    return 0;
}
