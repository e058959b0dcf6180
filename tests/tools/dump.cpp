// Fixture dumper: runs the full WORLD pipeline on a wav and writes
// F0/SPEC/AP parameter files (tagged binary format) + synthesized output
// as raw float64 and wav. Built single-threaded for determinism.
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include "audioio.hpp"
#include "parameterio.hpp"
#include "harvest.hpp"
#include "cheaptrick.hpp"
#include "d4c.hpp"
#include "synthesis.hpp"
#include "codec.hpp"

using namespace world_class;

static void write_f64(const char* fn, const double* p, long n) {
    FILE* fp = fopen(fn, "wb");
    fwrite(p, 8, n, fp);
    fclose(fp);
}

int main(int argc, char** argv) {
    if (argc < 3) { printf("usage: dump in.wav outprefix [frame_period]\n"); return 2; }
    double frame_period = argc >= 4 ? atof(argv[3]) : 5.0;
    int x_length = GetAudioLength(argv[1]);
    if (x_length <= 0) { printf("bad wav\n"); return 1; }
    int fs, nbit;
    double* x = new double[x_length];
    wavread(argv[1], &fs, &nbit, x);
    std::string pre(argv[2]);

    // Harvest (f0_floor=40 to match test.cpp)
    HarvestOption hopt;
    hopt.frame_period = frame_period;
    hopt.f0_floor = 40.0;
    Harvest harvest(fs, hopt);
    int f0_length = harvest.getSamples(fs, x_length);
    double* f0 = new double[f0_length];
    double* time_axis = new double[f0_length];
    harvest.compute(x, x_length, time_axis, f0);
    WriteF0((pre + ".f0").c_str(), f0_length, frame_period, time_axis, f0, 0);

    // CheapTrick
    CheapTrickOption copt;
    copt.f0_floor = 71.0;
    CheapTrick cheaptrick(fs, copt);
    int fft_size = cheaptrick.getFFTSizeForCheapTrick(fs, copt.f0_floor);
    int nbin = fft_size / 2 + 1;
    double** spectrogram = new double*[f0_length];
    double** aperiodicity = new double*[f0_length];
    for (int i = 0; i < f0_length; ++i) {
        spectrogram[i] = new double[nbin];
        aperiodicity[i] = new double[nbin];
    }
    cheaptrick.compute(x, x_length, time_axis, f0, f0_length, spectrogram);
    WriteSpectralEnvelope((pre + ".spec").c_str(), fs, f0_length, frame_period,
                          fft_size, 0, spectrogram);

    // D4C
    D4COption dopt;
    dopt.threshold = 0.85;
    D4C d4c(fs, dopt);
    d4c.compute(x, x_length, time_axis, f0, f0_length, fft_size, aperiodicity);
    WriteAperiodicity((pre + ".ap").c_str(), fs, f0_length, frame_period,
                      fft_size, 0, aperiodicity);

    // Codec round trip fixtures
    int n_ap = GetNumberOfAperiodicities(fs);
    double** coded_ap = new double*[f0_length];
    double** dec_ap = new double*[f0_length];
    int ndim_se = 32;  // mel-cepstrum dims for fixture
    double** coded_se = new double*[f0_length];
    double** dec_se = new double*[f0_length];
    for (int i = 0; i < f0_length; ++i) {
        coded_ap[i] = new double[n_ap];
        dec_ap[i] = new double[nbin];
        coded_se[i] = new double[ndim_se];
        dec_se[i] = new double[nbin];
    }
    CodeAperiodicity(aperiodicity, f0_length, fs, fft_size, coded_ap);
    DecodeAperiodicity(coded_ap, f0_length, fs, fft_size, dec_ap);
    CodeSpectralEnvelope(spectrogram, f0_length, fs, fft_size, ndim_se, coded_se);
    DecodeSpectralEnvelope(coded_se, f0_length, fs, fft_size, ndim_se, dec_se);
    {
        FILE* fp = fopen((pre + ".codec").c_str(), "wb");
        fwrite(&n_ap, 4, 1, fp);
        fwrite(&ndim_se, 4, 1, fp);
        for (int i = 0; i < f0_length; ++i) fwrite(coded_ap[i], 8, n_ap, fp);
        for (int i = 0; i < f0_length; ++i) fwrite(dec_ap[i], 8, nbin, fp);
        for (int i = 0; i < f0_length; ++i) fwrite(coded_se[i], 8, ndim_se, fp);
        for (int i = 0; i < f0_length; ++i) fwrite(dec_se[i], 8, nbin, fp);
        fclose(fp);
    }

    // Synthesis
    int y_length = (int)((f0_length - 1) * frame_period / 1000.0 * fs) + 1;
    double* y = new double[y_length]();
    Synthesis synthesis(fs, fft_size, frame_period);
    synthesis.compute(f0, f0_length, spectrogram, aperiodicity, y_length, y);
    write_f64((pre + ".syn.f64").c_str(), y, y_length);
    wavwrite(y, y_length, fs, 16, (pre + "_syn.wav").c_str());

    printf("dumped: f0_length=%d fft_size=%d y_length=%d fs=%d\n",
           f0_length, fft_size, y_length, fs);
    return 0;
}
