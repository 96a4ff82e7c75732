// Golden harness: the reference's FULL OFDM demodulator, compiled in place
// (read-only #include of /root/reference/src; nothing copied) against the
// fftw3.h shim in this directory — the one vendored dependency the image
// lacks. Drives OFDM_Demod::Process over an IQ stream and dumps each
// demodulated frame's int8 soft bits, so the framework's demodulator can be
// differentially compared with the reference end to end (BASELINE.md
// "frame-exact agreement" north star; previously only the digital decode
// layers had a compiled-reference oracle).
//
//   usage: ofdm_demod_harness <transmission_mode> [nb_threads]
//                             [impulse_peak_threshold_db]
//   stdin:  interleaved float32 I,Q pairs (complex64 stream)
//   stdout: per frame: nb_frame_bits int8 soft bits (raw, in order)
//   stderr: "frames=N desync=M" at EOF
//
// The optional threshold overrides OFDM_Demod_Config's fine-time sync
// gate (default 20 dB, ofdm_demodulator.h:42) — the same knob the
// reference GUI exposes. Mode III's 192-carrier/256-FFT PRS correlation
// peaks below the default, so the stock config never locks there (see
// test_reference_ofdm_demod_mode3_divergence).
//
// Frames fire from the demodulator's coordinator thread; a mutex-guarded
// ordered write keeps stdout consistent. One extra null-frame of zeros is
// fed at EOF so the final frame's pipeline flush completes before exit.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <complex>
#include <mutex>
#include <vector>

#include "ofdm/ofdm_helpers.h"
#include "viterbi_config.h"

int main(int argc, char** argv) {
    const int mode = argc > 1 ? std::atoi(argv[1]) : 1;
    const int nb_threads = argc > 2 ? std::atoi(argv[2]) : 1;
    auto demod = Create_OFDM_Demodulator(mode, nb_threads);
    if (argc > 3) {
        demod->GetConfig().sync.impulse_peak_threshold_db =
            (float)std::atof(argv[3]);
    }

    std::mutex out_mutex;
    demod->On_OFDM_Frame().Attach(
        [&](tcb::span<const viterbi_bit_t> bits) {
            std::lock_guard<std::mutex> lock(out_mutex);
            std::fwrite(bits.data(), 1, bits.size(), stdout);
        });

    const size_t BLOCK = 65536;
    std::vector<std::complex<float>> buf(BLOCK);
    while (true) {
        const size_t nread = std::fread(
            buf.data(), sizeof(std::complex<float>), BLOCK, stdin);
        if (nread == 0) break;
        demod->Process(tcb::span<const std::complex<float>>(
            buf.data(), nread));
    }
    // flush: the last frame's symbols finish demodulating asynchronously;
    // one frame of zeros forces the next ReadSymbols WaitEnd barrier
    const auto params = demod->GetOFDMParams();
    std::vector<std::complex<float>> zeros(
        params.nb_frame_symbols * params.nb_symbol_period
        + params.nb_null_period);
    demod->Process(zeros);
    {
        std::lock_guard<std::mutex> lock(out_mutex);
        std::fflush(stdout);
    }
    std::fprintf(stderr, "frames=%d desync=%d\n",
                 demod->GetTotalFramesRead(),
                 demod->GetTotalFramesDesync());
    return 0;
}
