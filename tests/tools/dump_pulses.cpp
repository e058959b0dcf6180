// Dump reference pulse metadata for parity debugging.
#include <cstdio>
#include <string>
#include "parameterio.hpp"
#include "synthesis.hpp"
using namespace world_class;
int main(int argc, char** argv) {
    std::string pre(argv[1]);
    int f0_length = (int)GetHeaderInformation((pre + ".f0").c_str(), "NOF ");
    double fp = GetHeaderInformation((pre + ".f0").c_str(), "FP  ");
    int fft_size = (int)GetHeaderInformation((pre + ".spec").c_str(), "FFT ");
    int fs = (int)GetHeaderInformation((pre + ".spec").c_str(), "FS  ");
    double* f0 = new double[f0_length];
    double* tpos = new double[f0_length];
    ReadF0((pre + ".f0").c_str(), tpos, f0);
    int y_length = (int)((f0_length - 1) * fp / 1000.0 * fs) + 1;
    Synthesis syn(fs, fft_size, fp);
    double* pl = new double[y_length];
    int* pli = new int[y_length];
    double* plts = new double[y_length];
    double* ivuv = new double[y_length];
    int n = syn.getTimeBase(f0, f0_length, fs, fp / 1000.0, y_length,
                            fs / (double)fft_size + 1.0, pl, pli, plts, ivuv);
    FILE* f = fopen((pre + ".pulses").c_str(), "wb");
    fwrite(&n, 4, 1, f);
    fwrite(pli, 4, n, f);
    fwrite(plts, 8, n, f);
    for (int i = 0; i < n; ++i) { double v = ivuv[pli[i]]; fwrite(&v, 8, 1, f); }
    fclose(f);
    printf("pulses: %d\n", n);
    return 0;
}
