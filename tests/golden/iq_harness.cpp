// Golden harness for the reference IQ-format readers (read-only
// examples/app_helpers headers #included in place).
//
// stdin line: "<mode> <hexbytes>"; prints "samples <re> <im> ..." per line.

#include <cstdio>
#include <string>
#include <vector>
#include <complex>
#include <memory>

#include "app_helpers/app_iq_readers.h"

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
    char line[65536];
    while (std::fgets(line, sizeof(line), stdin)) {
        std::string mode;
        const char* p = line;
        while (*p && *p != ' ') mode += *p++;
        if (*p == ' ') p++;
        auto bytes = parse_hex(p);

        FILE* f = tmpfile();
        fwrite(bytes.data(), 1, bytes.size(), f);
        rewind(f);
        auto file = std::make_shared<InputFile<uint8_t>>(f);
        auto reader = get_iq_file_reader_from_mode_string(file, mode);
        std::vector<std::complex<float>> buf(4096);
        size_t n = reader->read({buf.data(), buf.size()});
        std::printf("samples");
        for (size_t i = 0; i < n; i++)
            std::printf(" %.9g %.9g", buf[i].real(), buf[i].imag());
        std::printf("\n");
        std::fflush(stdout);
    }
    return 0;
}
