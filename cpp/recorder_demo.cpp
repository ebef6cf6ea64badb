// recorder_demo — integration harness for the AnalysisRecorder.
//
// Simulates a tiny real-time DSP process (two feedback-comb "reverb" taps
// fed by an impulse), captures them through the recorder exactly as a user
// engine would (ANALYSE_TAP per sample, tick() per block), and writes a
// bundle that `python -m analyse.cli bundle` can consume.
//
// Usage: recorder_demo <output_dir> [blocks] [block_size]

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "recorder.hpp"

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: recorder_demo <output_dir> [blocks] [block_size]\n");
        return 2;
    }
    const char* out_dir = argv[1];
    const int blocks = argc > 2 ? std::atoi(argv[2]) : 512;
    const int block_size = argc > 3 ? std::atoi(argv[3]) : 256;
    const int sr = 48000;

    audio_analysis::AnalysisRecorder rec;
    rec.set_path(out_dir);
    rec.begin(blocks, block_size, sr);

    // Two simple feedback combs with different decay (a stand-in DSP graph).
    std::vector<float> delay_a(997, 0.0f), delay_b(1409, 0.0f);
    size_t ia = 0, ib = 0;
    const float fb_a = 0.93f, fb_b = 0.88f;

    bool done = false;
    for (int b = 0; b < blocks && !done; ++b) {
        for (int s = 0; s < block_size; ++s) {
            const float x = (b == 0 && s == 0) ? 1.0f : 0.0f;  // impulse in

            const float ya = delay_a[ia];
            delay_a[ia] = x + fb_a * ya;
            ia = (ia + 1) % delay_a.size();

            const float yb = delay_b[ib];
            delay_b[ib] = x + fb_b * yb;
            ib = (ib + 1) % delay_b.size();

            ANALYSE_TAP(rec, "comb_a", ya, ya * 0.8f);
            ANALYSE_TAP(rec, "comb_b", yb * 0.8f, yb);
        }
        done = rec.tick();
    }

    if (!rec.finished) {
        std::fprintf(stderr, "recorder did not finish\n");
        return 1;
    }
    auto root = rec.write_bundle();
    if (root.empty()) {
        std::fprintf(stderr, "bundle write failed\n");
        return 1;
    }
    std::printf("%s\n", root.c_str());
    return 0;
}
