// Golden harness for the reference DAB+ superframe processor and CIF time
// deinterleaver (read-only reference sources #included in place).
//
// stdin protocol, one command per line:
//   F <hex>    feed one logical frame to AAC_Frame_Processor
//   D <hex>    feed one CIF of int8 soft bits to CIF_Deinterleaver
//              (constructed on first D with that byte count) and print the
//              deinterleaved output when available
// Events print as lines on stdout.

#include <cstdio>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "dab/audio/aac_frame_processor.h"
#include "dab/msc/cif_deinterleaver.h"

static std::vector<uint8_t> parse_hex(const char* p) {
    std::vector<uint8_t> out;
    auto hex = [](char c) -> int {
        if (c >= '0' && c <= '9') return c - '0';
        if (c >= 'a' && c <= 'f') return c - 'a' + 10;
        if (c >= 'A' && c <= 'F') return c - 'A' + 10;
        return -1;
    };
    while (p[0] && p[1] && p[0] != '\n') {
        int hi = hex(p[0]), lo = hex(p[1]);
        if (hi < 0 || lo < 0) break;
        out.push_back((uint8_t)((hi << 4) | lo));
        p += 2;
    }
    return out;
}

int main() {
    AAC_Frame_Processor proc;
    proc.OnSuperFrameHeader().Attach([](SuperFrameHeader h) {
        std::printf("header %u %d %d %d %d\n", h.sampling_rate,
                    (int)h.is_parametric_stereo,
                    (int)h.is_spectral_band_replication, (int)h.is_stereo,
                    (int)h.mpeg_surround);
    });
    proc.OnAccessUnit().Attach([](const int i, const int total,
                                  tcb::span<uint8_t> au) {
        std::printf("au %d %d", i, total);
        for (size_t k = 0; k < au.size(); k++) std::printf(" %u", au[k]);
        std::printf("\n");
    });
    proc.OnFirecodeError().Attach([](const int i, const uint16_t got,
                                     const uint16_t calc) {
        std::printf("firecode_err %d %u %u\n", i, got, calc);
    });
    proc.OnRSError().Attach([](const int i, const int total) {
        std::printf("rs_err %d %d\n", i, total);
    });
    proc.OnAccessUnitCRCError().Attach([](const int i, const int total,
                                          const uint16_t got,
                                          const uint16_t calc) {
        std::printf("au_crc_err %d %d %u %u\n", i, total, got, calc);
    });

    std::unique_ptr<CIF_Deinterleaver> deint;
    std::vector<viterbi_bit_t> dbits;

    std::string line;
    char buf[65536];
    int idx = 0;
    while (std::fgets(buf, sizeof(buf), stdin)) {
        char cmd = buf[0];
        auto bytes = parse_hex(buf + 2);
        std::printf("input %d\n", idx++);
        if (cmd == 'F') {
            proc.Process({bytes.data(), bytes.size()});
        } else if (cmd == 'D') {
            // hex bytes reinterpreted as int8 soft bits
            const size_t n = bytes.size();
            if (!deint) {
                deint = std::make_unique<CIF_Deinterleaver>((int)(n / 8));
                dbits.resize(n);
            }
            tcb::span<const viterbi_bit_t> in(
                reinterpret_cast<const viterbi_bit_t*>(bytes.data()), n);
            deint->Consume(in);
            bool ready = deint->Deinterleave({dbits.data(), dbits.size()});
            if (ready) {
                std::printf("deint");
                for (size_t k = 0; k < n; k++)
                    std::printf(" %d", (int)dbits[k]);
                std::printf("\n");
            } else {
                std::printf("deint_pending\n");
            }
        }
        std::fflush(stdout);
    }
    return 0;
}
