// Golden harness for the reference packet-mode pipeline (read-only
// reference sources #included in place): optional RS(204,188) packet FEC ->
// packet assembly -> MSC data groups -> MOT.
//
// stdin, one line per MSC payload chunk:
//   K <hex>   feed through MSC_Data_Packet_Processor (packet -> MOT)
//   R <hex>   feed through MSC_Reed_Solomon_Data_Packet_Processor, then the
//             corrected packets flow into the packet processor
// stdout events:
//   input <n>
//   fec_packet <is_corrected> <hex>      (R path only, post-FEC packets)
//   mot <tid> <content_type> <content_sub_type> <name_hex|-> <body_hex>

#include <cstdio>
#include <string>
#include <vector>

#include "dab/msc/msc_data_packet_processor.h"
#include "dab/msc/msc_reed_solomon_data_packet_processor.h"
#include "dab/mot/MOT_processor.h"
#include "dab/mot/MOT_entities.h"

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

static void print_hex(const uint8_t* p, size_t n) {
    for (size_t i = 0; i < n; i++) std::printf("%02x", p[i]);
}

int main(int argc, char** argv) {
    uint16_t packet_addr = 2;
    if (argc > 1) packet_addr = (uint16_t)atoi(argv[1]);

    MSC_Data_Packet_Processor pkt;
    pkt.Get_MOT_Processor().OnEntityComplete().Attach([](MOT_Entity e) {
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

    MSC_Reed_Solomon_Data_Packet_Processor fec;
    fec.SetCallback([&](tcb::span<const uint8_t> p, bool corrected) {
        std::printf("fec_packet %d ", (int)corrected);
        print_hex(p.data(), p.size());
        std::printf("\n");
        size_t i = 0;
        while (i < p.size()) {
            size_t used = pkt.ReadPacket(p.subspan(i), packet_addr);
            if (used == 0) break;
            i += used;
        }
    });

    char buf[65536];
    int idx = 0;
    while (std::fgets(buf, sizeof(buf), stdin)) {
        char cmd = buf[0];
        auto bytes = parse_hex(buf + 2);
        std::printf("input %d\n", idx++);
        size_t i = 0;
        while (i < bytes.size()) {
            tcb::span<const uint8_t> span(bytes.data() + i,
                                          bytes.size() - i);
            size_t used = (cmd == 'R') ? fec.ReadPacket(span)
                                       : pkt.ReadPacket(span, packet_addr);
            if (used == 0) break;
            i += used;
        }
        std::fflush(stdout);
    }
    return 0;
}
