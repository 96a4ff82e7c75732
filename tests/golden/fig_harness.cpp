// FIG golden harness: runs the reference FIG_Processor (read-only,
// #included in place from /root/reference) over FIBs supplied as hex lines
// on stdin and prints one event line per handler callback, for
// tests/test_golden_reference.py::test_fig_processor_matches to compare
// against this framework's FIG parser.

#include <cstdio>
#include <cstring>
#include <string>
#include <string_view>
#include <vector>

#include "dab/fic/fig_processor.h"
#include "dab/fic/fig_handler_interface.h"

struct Printer final : FIG_Handler_Interface {
    void OnEnsemble_1_ID(EnsembleId eid, uint8_t chg, uint8_t alarm,
                         uint8_t cifu, uint8_t cifl) override {
        std::printf("ens_info %u %u %u %u %u\n", eid.value, chg, alarm,
                    cifu, cifl);
    }
    void OnSubchannel_1_Short(subchannel_id_t id, uint16_t start,
                              uint8_t sw, uint8_t idx) override {
        std::printf("subch_s %u %u %u %u\n", id, start, sw, idx);
    }
    void OnSubchannel_1_Long(subchannel_id_t id, uint16_t start, uint8_t opt,
                             uint8_t prot, uint16_t size) override {
        std::printf("subch_l %u %u %u %u %u\n", id, start, opt, prot, size);
    }
    void OnServiceComponent_1_StreamAudioType(ServiceId sid,
                                              subchannel_id_t sub,
                                              uint8_t ty,
                                              bool primary) override {
        std::printf("comp_audio %u %u %u %d\n", sid.value, sub, ty,
                    (int)primary);
    }
    void OnServiceComponent_1_StreamDataType(ServiceId sid,
                                             subchannel_id_t sub, uint8_t ty,
                                             bool primary) override {
        std::printf("comp_data %u %u %u %d\n", sid.value, sub, ty,
                    (int)primary);
    }
    void OnServiceComponent_1_PacketDataType(ServiceId sid,
                                             service_component_global_id_t g,
                                             bool primary) override {
        std::printf("comp_packetref %u %u %d\n", sid.value, g, (int)primary);
    }
    void OnServiceComponent_2_PacketDataType(service_component_global_id_t g,
                                             subchannel_id_t sub, uint8_t ty,
                                             uint16_t addr) override {
        std::printf("packet_comp %u %u %u %u\n", g, sub, ty, addr);
    }
    void OnServiceComponent_2_StreamConditionalAccess(subchannel_id_t sub,
                                                      uint16_t ca) override {
        std::printf("ca %u %u\n", sub, ca);
    }
    void OnServiceComponent_3_Short_Language(subchannel_id_t sub,
                                             uint8_t lang) override {
        std::printf("lang_s %u %u\n", sub, lang);
    }
    void OnServiceComponent_3_Long_Language(service_component_global_id_t g,
                                            uint8_t lang) override {
        std::printf("lang_l %u %u\n", g, lang);
    }
    void OnServiceLinkage_1_LSN_Only(bool a, bool h, bool i,
                                     lsn_t lsn) override {
        std::printf("link_lsn %d %d %d %u\n", (int)a, (int)h, (int)i, lsn);
    }
    void OnServiceLinkage_1_ServiceID(bool a, bool h, bool i, lsn_t lsn,
                                      ServiceId sid) override {
        std::printf("link_sid %d %d %d %u %u\n", (int)a, (int)h, (int)i, lsn,
                    sid.value);
    }
    void OnServiceLinkage_1_RDS_PI_ID(bool a, bool h, bool i, lsn_t lsn,
                                      fm_id_t pi, uint8_t) override {
        std::printf("link_rds %d %d %d %u %u\n", (int)a, (int)h, (int)i, lsn,
                    pi);
    }
    void OnServiceLinkage_1_DRM_ID(bool a, bool h, bool i, lsn_t lsn,
                                   drm_id_t id) override {
        std::printf("link_drm %d %d %d %u %u\n", (int)a, (int)h, (int)i, lsn,
                    id);
    }
    void OnConfigurationInformation_1(uint8_t nb,
                                      uint16_t count) override {
        std::printf("config %u %u\n", nb, count);
    }
    void OnServiceComponent_4_Short_Definition(ServiceId sid,
                                               service_component_id_t c,
                                               subchannel_id_t sub) override {
        std::printf("gdef_s %u %u %u\n", sid.value, c, sub);
    }
    void OnServiceComponent_4_Long_Definition(
            ServiceId sid, service_component_id_t c,
            service_component_global_id_t g) override {
        std::printf("gdef_l %u %u %u\n", sid.value, c, g);
    }
    void OnEnsemble_2_Country(uint8_t lto, uint8_t ecc,
                              uint8_t table) override {
        std::printf("country %u %u %u\n", lto, ecc, table);
    }
    void OnEnsemble_2_Service_Country(uint8_t lto, uint8_t ecc, uint8_t table,
                                      ServiceId sid) override {
        std::printf("country_svc %u %u %u %u\n", lto, ecc, table, sid.value);
    }
    void OnDateTime_1(uint32_t mjd, uint8_t h, uint8_t m, uint8_t s,
                      uint16_t ms, bool lsi, bool long_form) override {
        std::printf("datetime %u %u %u %u %u %d %d\n", mjd, h, m, s, ms,
                    (int)lsi, (int)long_form);
    }
    void OnServiceComponent_5_UserApplication(ServiceId sid,
                                              service_component_id_t c,
                                              uint16_t app,
                                              const uint8_t* buf,
                                              uint8_t n) override {
        std::printf("userapp %u %u %u", sid.value, c, app);
        for (int k = 0; k < n; k++) std::printf(" %u", buf[k]);
        std::printf("\n");
    }
    void OnSubchannel_2_FEC(subchannel_id_t sub, uint8_t fec) override {
        std::printf("fec %u %u\n", sub, fec);
    }
    void OnService_1_ProgrammeType(ServiceId sid, uint8_t pt) override {
        std::printf("ptype %u %u\n", sid.value, pt);
    }
    void OnFrequencyInformation_1_Ensemble(EnsembleId eid, uint32_t f,
                                           bool cont, bool, bool) override {
        std::printf("fi_ens %u %u %d\n", eid.value, f, (int)cont);
    }
    void OnFrequencyInformation_1_RDS_PI(fm_id_t id, uint32_t f,
                                         bool tc) override {
        std::printf("fi_rds %u %u %d\n", id, f, (int)tc);
    }
    void OnFrequencyInformation_1_DRM(drm_id_t id, uint32_t f,
                                      bool tc) override {
        std::printf("fi_drm %u %u %d\n", id, f, (int)tc);
    }
    void OnFrequencyInformation_1_AMSS(amss_id_t id, uint32_t f,
                                       bool tc) override {
        std::printf("fi_amss %u %u %d\n", id, f, (int)tc);
    }
    void OnOtherEnsemble_1_Service(ServiceId sid, EnsembleId eid) override {
        std::printf("oe %u %u\n", sid.value, eid.value);
    }
    void OnEnsemble_3_Label(EnsembleId eid, std::string_view l,
                            std::string_view s) override {
        std::printf("label_ens %u |%.*s|%.*s|\n", eid.value,
                    (int)l.size(), l.data(), (int)s.size(), s.data());
    }
    void OnService_2_Label(ServiceId sid, std::string_view l,
                           std::string_view s) override {
        std::printf("label_svc %u |%.*s|%.*s|\n", sid.value,
                    (int)l.size(), l.data(), (int)s.size(), s.data());
    }
    void OnServiceComponent_6_Label(ServiceId sid, service_component_id_t c,
                                    std::string_view l,
                                    std::string_view s) override {
        std::printf("label_comp %u %u |%.*s|%.*s|\n", sid.value, c,
                    (int)l.size(), l.data(), (int)s.size(), s.data());
    }
};

int main() {
    Printer handler;
    FIG_Processor proc;
    proc.SetHandler(&handler);
    char line[4096];
    int idx = 0;
    setvbuf(stderr, nullptr, _IONBF, 0);
    while (std::fgets(line, sizeof(line), stdin)) {
        std::vector<uint8_t> fib;
        for (char* p = line; p[0] && p[1] && p[0] != '\n'; p += 2) {
            auto hex = [](char c) -> int {
                if (c >= '0' && c <= '9') return c - '0';
                if (c >= 'a' && c <= 'f') return c - 'a' + 10;
                if (c >= 'A' && c <= 'F') return c - 'A' + 10;
                return -1;
            };
            int hi = hex(p[0]), lo = hex(p[1]);
            if (hi < 0 || lo < 0) break;
            fib.push_back((uint8_t)((hi << 4) | lo));
        }
        std::printf("fib %d\n", idx);
        std::fprintf(stderr, "fib %d\n", idx);   // ASan-report marker
        idx++;
        proc.ProcessFIB({fib.data(), fib.size()});
        std::fflush(stdout);
    }
    return 0;
}
