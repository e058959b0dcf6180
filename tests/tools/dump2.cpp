// Synthesis-only fixture: reads .f0/.spec/.ap parameter files and synthesizes
// with a FRESH randn() stream (process start) so the noise sequence is
// exactly reproducible by the xorshift parity generator.
#include <cstdio>
#include <cstdlib>
#include <string>
#include "parameterio.hpp"
#include "audioio.hpp"
#include "synthesis.hpp"

using namespace world_class;

int main(int argc, char** argv) {
    if (argc < 3) { printf("usage: dump2 prefix outprefix\n"); return 2; }
    std::string pre(argv[1]), out(argv[2]);
    int f0_length = (int)GetHeaderInformation((pre + ".f0").c_str(), "NOF ");
    double frame_period = GetHeaderInformation((pre + ".f0").c_str(), "FP  ");
    int fft_size = (int)GetHeaderInformation((pre + ".spec").c_str(), "FFT ");
    int fs = (int)GetHeaderInformation((pre + ".spec").c_str(), "FS  ");
    int nbin = fft_size / 2 + 1;

    double* f0 = new double[f0_length];
    double* tpos = new double[f0_length];
    ReadF0((pre + ".f0").c_str(), tpos, f0);
    double** sp = new double*[f0_length];
    double** ap = new double*[f0_length];
    for (int i = 0; i < f0_length; ++i) { sp[i] = new double[nbin]; ap[i] = new double[nbin]; }
    ReadSpectralEnvelope((pre + ".spec").c_str(), sp);
    ReadAperiodicity((pre + ".ap").c_str(), ap);

    int y_length = (int)((f0_length - 1) * frame_period / 1000.0 * fs) + 1;
    double* y = new double[y_length]();
    Synthesis synthesis(fs, fft_size, frame_period);
    synthesis.compute(f0, f0_length, sp, ap, y_length, y);

    FILE* fp = fopen((out + ".syn2.f64").c_str(), "wb");
    fwrite(y, 8, y_length, fp);
    fclose(fp);
    printf("dump2 ok: f0_length=%d fft=%d fs=%d y=%d\n", f0_length, fft_size, fs, y_length);
    return 0;
}
