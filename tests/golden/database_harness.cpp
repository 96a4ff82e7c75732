// Golden harness for the reference FIC->database chain: FIG_Processor ->
// Radio_FIG_Handler -> DAB_Database_Updater (read-only reference sources
// #included in place). Feeds FIB hex lines from stdin; at EOF dumps the
// database's core entities in a canonical text form for comparison with
// this framework's DatabaseUpdater.

#include <algorithm>
#include <cstdio>
#include <string>
#include <vector>

#include "dab/fic/fig_processor.h"
#include "dab/radio_fig_handler.h"
#include "dab/database/dab_database.h"
#include "dab/database/dab_database_updater.h"
#include "dab/dab_misc_info.h"

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

static void print_hexs(const std::string& s) {
    for (unsigned char c : s) std::printf("%02x", c);
    if (s.empty()) std::printf("-");
}

int main() {
    DAB_Database_Updater updater;
    DAB_Misc_Info misc;
    Radio_FIG_Handler handler;
    handler.SetUpdater(&updater);
    handler.SetMiscInfo(&misc);
    FIG_Processor proc;
    proc.SetHandler(&handler);

    char buf[4096];
    while (std::fgets(buf, sizeof(buf), stdin)) {
        auto fib = parse_hex(buf);
        proc.ProcessFIB({fib.data(), fib.size()});
    }

    const auto& db = updater.GetDatabase();
    const auto& e = db.ensemble;
    std::printf("ens %u %u ", e.id.value, e.extended_country_code);
    print_hexs(e.label);
    std::printf(" ");
    print_hexs(e.short_label);
    std::printf(" %u %u %d %u %d\n", e.nb_services, e.reconfiguration_count,
                (int)e.local_time_offset, e.international_table_id,
                (int)e.is_complete);

    auto svcs = db.services;
    std::sort(svcs.begin(), svcs.end(), [](const Service& a,
                                           const Service& b) {
        return a.id.value < b.id.value;
    });
    for (const auto& s : svcs) {
        std::printf("svc %u ", s.id.value);
        print_hexs(s.label);
        std::printf(" ");
        print_hexs(s.short_label);
        std::printf(" %u %d\n", s.programme_type, (int)s.is_complete);
    }

    auto comps = db.service_components;
    std::sort(comps.begin(), comps.end(),
              [](const ServiceComponent& a, const ServiceComponent& b) {
        if (a.service_id.value != b.service_id.value)
            return a.service_id.value < b.service_id.value;
        return a.component_id < b.component_id;
    });
    for (const auto& c : comps) {
        std::printf("comp %u %u %u %u %u ", c.service_id.value,
                    c.component_id, c.global_id, c.subchannel_id,
                    c.packet_address);
        print_hexs(c.label);
        std::printf(" %u %d %d %d", c.language, (int)c.transport_mode,
                    (int)c.audio_service_type, (int)c.data_service_type);
        for (auto t : c.application_types) std::printf(" %u", t);
        std::printf(" %d\n", (int)c.is_complete);
    }

    auto links = db.link_services;
    std::sort(links.begin(), links.end(), [](const LinkService& a,
                                             const LinkService& b) {
        return a.id < b.id;
    });
    for (const auto& l : links) {
        std::printf("link %u %d %d %d %u %d\n", l.id, (int)l.is_active_link,
                    (int)l.is_hard_link, (int)l.is_international,
                    l.service_id.value, (int)l.is_complete);
    }
    auto fms = db.fm_services;
    std::sort(fms.begin(), fms.end(), [](const FM_Service& a,
                                         const FM_Service& b) {
        return a.RDS_PI_code < b.RDS_PI_code;
    });
    for (const auto& f : fms) {
        std::printf("fm %u %u %d", f.RDS_PI_code, f.linkage_set_number,
                    (int)f.is_time_compensated);
        for (auto q : f.frequencies) std::printf(" %u", q);
        std::printf(" %d\n", (int)f.is_complete);
    }
    auto drms = db.drm_services;
    std::sort(drms.begin(), drms.end(), [](const DRM_Service& a,
                                           const DRM_Service& b) {
        return a.drm_code < b.drm_code;
    });
    for (const auto& d : drms) {
        std::printf("drm %u %u %d", d.drm_code, d.linkage_set_number,
                    (int)d.is_time_compensated);
        for (auto q : d.frequencies) std::printf(" %u", q);
        std::printf(" %d\n", (int)d.is_complete);
    }
    auto oes = db.other_ensembles;
    std::sort(oes.begin(), oes.end(), [](const OtherEnsemble& a,
                                         const OtherEnsemble& b) {
        return a.id.value < b.id.value;
    });
    for (const auto& o : oes) {
        std::printf("oe %u %u %d %d %d %d\n", o.id.value, o.frequency,
                    (int)o.is_continuous_output,
                    (int)o.is_geographically_adjacent,
                    (int)o.is_transmission_mode_I, (int)o.is_complete);
    }
    std::printf("misc %u %u %d %d %d %u %u %u %u\n",
                misc.cif_counter.upper_count, misc.cif_counter.lower_count,
                misc.datetime.year, misc.datetime.month, misc.datetime.day,
                misc.datetime.hours, misc.datetime.minutes,
                misc.datetime.seconds, misc.datetime.milliseconds);

    auto subs = db.subchannels;
    std::sort(subs.begin(), subs.end(), [](const Subchannel& a,
                                           const Subchannel& b) {
        return a.id < b.id;
    });
    for (const auto& s : subs) {
        std::printf("subch %u %u %u %d %u %u %d %d %d\n", s.id,
                    s.start_address, s.length, (int)s.is_uep,
                    s.uep_prot_index, s.eep_prot_level, (int)s.eep_type,
                    (int)s.fec_scheme, (int)s.is_complete);
    }
    return 0;
}
