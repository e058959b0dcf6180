#include <cstdio>
#include "audioio.hpp"
#include "harvest.hpp"
using namespace world_class;
int main(int argc, char** argv) {
    int x_length = GetAudioLength(argv[1]);
    int fs, nbit;
    double* x = new double[x_length];
    wavread(argv[1], &fs, &nbit, x);
    HarvestOption option;
    option.frame_period = 5.0;
    option.f0_floor = 40.0;
    option.use_cos_table = true;
    Harvest h(fs, option);
    int n = h.getSamples(fs, x_length);
    double* f0 = new double[n];
    double* tp = new double[n];
    h.compute(x, x_length, tp, f0);
    FILE* fp = fopen(argv[2], "wb");
    fwrite(f0, 8, n, fp);
    fclose(fp);
    printf("costab dump: %d frames\n", n);
    return 0;
}
