// Op-level golden dump: decimate, interp1, interp1Q, NuttallWindow,
// DCCorrection, LinearSmoothing, minimum phase on pseudo-random data.
#include <cstdio>
#include <cmath>
#include "world_common.hpp"
#include "world_matlabfunctions.hpp"

static void wr(FILE* fp, const double* p, long n) { fwrite(p, 8, n, fp); }

int main() {
    FILE* fp = fopen("probe_ops.bin", "wb");

    // deterministic pseudo random signal
    const int N = 1000;
    double x[N];
    for (int i = 0; i < N; ++i)
        x[i] = sin(0.31 * i) + 0.5 * sin(1.7 * i + 0.4) + 0.2 * cos(5.1 * i);
    wr(fp, x, N);

    // decimate for r = 2..12
    for (int r = 2; r <= 12; ++r) {
        int n_out = N / r + 1 + 16;  // over-allocate; count below
        double* y = new double[n_out * 2]();
        decimate(x, N, r, y);
        // replicate count: i from nbeg while i < N + 9 step r
        int nout = N / r + 1;
        int nbeg = r - r * nout + N;
        int count = 0;
        for (int i = nbeg; i < N + 9; i += r) count++;
        int c32 = count;
        fwrite(&c32, 4, 1, fp);
        wr(fp, y, count);
        delete[] y;
    }

    // interp1: knots at cumulative irregular positions
    const int NK = 17;
    double xk[NK], yk[NK];
    double acc = 0.3;
    for (int i = 0; i < NK; ++i) {
        acc += 0.2 + 0.15 * (1 + sin(2.1 * i));
        xk[i] = acc;
        yk[i] = cos(0.8 * i);
    }
    const int NQ = 300;
    double xq[NQ], yq[NQ];
    for (int i = 0; i < NQ; ++i) xq[i] = 0.0 + 0.03 * i;  // spans outside both ends
    interp1(xk, yk, NK, xq, NQ, yq);
    wr(fp, xk, NK); wr(fp, yk, NK); wr(fp, xq, NQ); wr(fp, yq, NQ);

    // interp1Q
    double yi_q[NQ];
    interp1Q(-1.0, 0.37, yk, NK, xq, NQ, yi_q);
    wr(fp, yi_q, NQ);

    // NuttallWindow
    double w[129];
    NuttallWindow(129, w);
    wr(fp, w, 129);

    // DCCorrection + LinearSmoothing on a synthetic power spectrum
    const int FFT = 512, K = FFT / 2 + 1;
    int fs = 16000;
    double ps[K], out1[K], out2[K];
    for (int i = 0; i < K; ++i)
        ps[i] = 1e-3 + exp(-0.5 * pow((i - 40.0) / 15.0, 2)) + 0.3 * exp(-0.5 * pow((i - 130.0) / 30.0, 2));
    DCCorrection(ps, 160.0, fs, FFT, out1);
    wr(fp, out1, K);
    LinearSmoothing(ps, 160.0 * 2.0 / 3.0, fs, FFT, out2);
    wr(fp, out2, K);
    // in-place chained like CheapTrick does
    double chain[K];
    for (int i = 0; i < K; ++i) chain[i] = ps[i];
    DCCorrection(chain, 123.4, fs, FFT, chain);
    LinearSmoothing(chain, 123.4 * 2.0 / 3.0, fs, FFT, chain);
    wr(fp, chain, K);

    fclose(fp);
    printf("probe_ops ok\n");
    return 0;
}
