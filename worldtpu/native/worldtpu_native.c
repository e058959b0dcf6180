/* worldtpu native runtime helpers (C, built on demand via ctypes).
 *
 * These replicate host-side, inherently sequential details of the reference
 * exactly, for the golden-parity path:
 *  - the xorshift128 sum-of-12-uniforms randn() stream
 *    (/root/reference/src/world_matlabfunctions.cpp:243-264), which is
 *    stateful and call-order dependent;
 *  - the int-truncating mean accumulator of Harvest's DC removal
 *    (/root/reference/src/harvest.cpp:239: accumulate(y, y+n, 0) with an
 *    int initial value truncates the running sum toward zero every step).
 */
#include <stdint.h>
#include <stddef.h>

typedef struct {
    uint32_t x, y, z, w;
} XorshiftState;

void worldtpu_randn_init(XorshiftState* s) {
    s->x = 123456789u;
    s->y = 362436069u;
    s->z = 521288629u;
    s->w = 88675123u;
}

static double randn_one(XorshiftState* s) {
    uint32_t t;
    t = s->x ^ (s->x << 11);
    s->x = s->y; s->y = s->z; s->z = s->w;
    (void)t;
    uint32_t tmp = 0u;
    for (int i = 0; i < 12; ++i) {
        t = s->x ^ (s->x << 11);
        s->x = s->y; s->y = s->z; s->z = s->w;
        s->w = (s->w ^ (s->w >> 19)) ^ (t ^ (t >> 8));
        tmp += s->w >> 4;
    }
    return tmp / 268435456.0 - 6.0;
}

void worldtpu_randn_fill(XorshiftState* s, double* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) out[i] = randn_one(s);
}

/* Exact replica of `accumulate(y, y+n, 0)` (int init): every partial sum is
 * truncated toward zero.  Returns the (integer) truncated sum as double. */
double worldtpu_int_trunc_sum(const double* x, int64_t n) {
    long long acc = 0;
    for (int64_t i = 0; i < n; ++i) {
        double v = (double)acc + x[i];
        acc = (long long)v; /* C cast truncates toward zero */
    }
    return (double)acc;
}

/* Zero-lag biquad used by the F0 contour smoother: one forward pass writing
 * the output time-reversed, applied twice (so the second pass runs over the
 * reversed signal and un-reverses it).  Must keep the exact operation order
 * of the Python fallback in worldtpu/analysis/contour.py:_filtering_f0
 * (no FMA contraction: built with -ffp-contract=off). */
static void biquad_pass(const double* sig, int64_t n, double* out,
                        double b0, double b1, double a0, double a1) {
    double w0 = 0.0, w1 = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double wt = sig[i] + a0 * w0 + a1 * w1;
        out[n - i - 1] = b0 * wt + b1 * w0 + b0 * w1;
        w1 = w0;
        w0 = wt;
    }
}

void worldtpu_filter_f0(const double* x, int64_t n, double* tmp, double* out,
                        double b0, double b1, double a0, double a1) {
    biquad_pass(x, n, tmp, b0, b1, a0, a1);
    biquad_pass(tmp, n, out, b0, b1, a0, a1);
}
