// Golden harness for the reference PAD / dynamic-label / MOT stack
// (read-only reference sources #included in place).
//
// stdin: one line per PAD field: "P <fpad_hex>|<xpad_reversed_hex>"
// stdout events:
//   input <n>
//   label |<bytes as hex>|
//   label_cmd <id>
//   mot <tid> <content_type> <content_sub_type> <name_hex or -> <body_hex>

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "dab/pad/pad_processor.h"
#include "dab/mot/MOT_entities.h"
#include "dab/audio/aac_data_decoder.h"

static std::vector<uint8_t> parse_hex(const char* p, const char** endp) {
    std::vector<uint8_t> out;
    auto hex = [](char c) -> int {
        if (c >= '0' && c <= '9') return c - '0';
        if (c >= 'a' && c <= 'f') return c - 'a' + 10;
        if (c >= 'A' && c <= 'F') return c - 'A' + 10;
        return -1;
    };
    while (p[0] && p[1]) {
        int hi = hex(p[0]), lo = hex(p[1]);
        if (hi < 0 || lo < 0) break;
        out.push_back((uint8_t)((hi << 4) | lo));
        p += 2;
    }
    *endp = p;
    return out;
}

static void print_hex(const uint8_t* p, size_t n) {
    for (size_t i = 0; i < n; i++) std::printf("%02x", p[i]);
}

int main() {
    AAC_Data_Decoder aac_data;
    PAD_Processor& pad = aac_data.Get_PAD_Processor();
    pad.OnLabelUpdate().Attach([](const std::string& label) {
        std::printf("label |");
        print_hex((const uint8_t*)label.data(), label.size());
        std::printf("|\n");
    });
    pad.OnLabelCommand().Attach([](uint8_t cmd) {
        std::printf("label_cmd %u\n", cmd);
    });
    pad.OnMOTUpdate().Attach([](MOT_Entity e) {
        std::printf("mot %u %u %u ", e.transport_id,
                    e.header.content_type, e.header.content_sub_type);
        if (e.header.content_name.has_value()) {
            const auto& s = e.header.content_name.value();
            print_hex((const uint8_t*)s.data(), s.size());
        } else {
            std::printf("-");
        }
        std::printf(" ");
        print_hex(e.body_buf.data(), e.body_buf.size());
        std::printf("\n");
    });

    char buf[65536];
    int idx = 0;
    while (std::fgets(buf, sizeof(buf), stdin)) {
        if (buf[0] == 'P') {
            const char* p = buf + 2;
            const char* end = nullptr;
            auto fpad = parse_hex(p, &end);
            if (*end == '|') end++;
            const char* end2 = nullptr;
            auto xpad = parse_hex(end, &end2);
            std::printf("input %d\n", idx++);
            pad.Process({fpad.data(), fpad.size()},
                        {xpad.data(), xpad.size()});
        } else if (buf[0] == 'A') {
            // full access unit: PAD extracted from data_stream_element
            const char* end = nullptr;
            auto au = parse_hex(buf + 2, &end);
            std::printf("input %d\n", idx++);
            aac_data.ProcessAccessUnit({au.data(), au.size()});
        }
        std::fflush(stdout);
    }
    return 0;
}
