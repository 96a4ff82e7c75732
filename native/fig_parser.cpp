// FIG (Fast Information Group) binary parser — native host component.
//
// Mirrors dab_radio_tpu/dab/fig.py exactly (same extension set and the same
// truncation/early-exit behaviour, differential-fuzzed in
// tests/test_fig_native.py). Reference analog: src/dab/fic/fig_processor.cpp
// (1.8k LoC C++); this parser keeps the byte-protocol layer native per the
// framework's design stance (SURVEY.md §7).
//
// Output: a packed little-endian record stream the Python binding decodes
// into the fig.py event dataclasses:
//   [u8 tag][u16 len][payload]...
// Label records carry the raw 16 label bytes + flag field; charset decoding
// stays in Python (table-driven, cold).

#include <cstdint>
#include <cstring>

namespace {

struct Writer {
    uint8_t* out;
    int64_t cap;
    int64_t pos = 0;
    bool overflow = false;

    uint8_t* rec(uint8_t tag, int payload_len) {
        if (pos + 3 + payload_len > cap) { overflow = true; return nullptr; }
        out[pos] = tag;
        out[pos + 1] = (uint8_t)(payload_len & 0xFF);
        out[pos + 2] = (uint8_t)((payload_len >> 8) & 0xFF);
        uint8_t* p = out + pos + 3;
        pos += 3 + payload_len;
        return p;
    }
};

inline void put_u16(uint8_t* p, uint32_t v) {
    p[0] = v & 0xFF; p[1] = (v >> 8) & 0xFF;
}
inline void put_u32(uint8_t* p, uint32_t v) {
    p[0] = v & 0xFF; p[1] = (v >> 8) & 0xFF;
    p[2] = (v >> 16) & 0xFF; p[3] = (v >> 24) & 0xFF;
}

inline uint32_t service_id(const uint8_t* b, int len) {
    if (len == 4)
        return ((uint32_t)b[0] << 24) | ((uint32_t)b[1] << 16)
             | ((uint32_t)b[2] << 8) | b[3];
    return ((uint32_t)b[0] << 8) | b[1];
}

// ---- FIG type 0 extensions ----

void fig0_0(const uint8_t* b, int n, Writer& w) {
    if (n != 4) return;
    uint8_t* p = w.rec(1, 6);
    if (!p) return;
    put_u16(p, ((uint32_t)b[0] << 8) | b[1]);
    p[2] = (b[2] >> 6) & 3; p[3] = (b[2] >> 5) & 1;
    p[4] = b[2] & 0x1F; p[5] = b[3];
}

void fig0_1(const uint8_t* b, int n, Writer& w) {
    int i = 0;
    while (i + 3 <= n) {
        uint8_t sub_id = (b[i] >> 2) & 0x3F;
        uint32_t start = ((uint32_t)(b[i] & 3) << 8) | b[i + 1];
        if (!((b[i + 2] >> 7) & 1)) {
            uint8_t* p = w.rec(2, 5);
            if (!p) return;
            p[0] = sub_id; put_u16(p + 1, start);
            p[3] = (b[i + 2] >> 6) & 1; p[4] = b[i + 2] & 0x3F;
            i += 3;
        } else {
            if (i + 4 > n) break;
            uint8_t* p = w.rec(3, 7);
            if (!p) return;
            p[0] = sub_id; put_u16(p + 1, start);
            p[3] = (b[i + 2] >> 4) & 7; p[4] = (b[i + 2] >> 2) & 3;
            put_u16(p + 5, ((uint32_t)(b[i + 2] & 3) << 8) | b[i + 3]);
            i += 4;
        }
    }
}

void fig0_2(const uint8_t* b, int n, int pd, Writer& w) {
    int i = 0;
    const int sid_len = pd ? 4 : 2;
    while (i < n) {
        if (i + sid_len + 1 > n) break;
        uint32_t sid = service_id(b + i, sid_len);
        int nb_comp = b[i + sid_len] & 0x0F;
        int j = i + sid_len + 1;
        if (j + 2 * nb_comp > n) break;
        for (int k = 0; k < nb_comp; k++) {
            uint8_t b0 = b[j + 2 * k], b1 = b[j + 2 * k + 1];
            int tmid = (b0 >> 6) & 3;
            if (tmid == 0 || tmid == 1) {
                uint8_t* p = w.rec(4, 8);
                if (!p) return;
                put_u32(p, sid);
                p[4] = (b1 >> 2) & 0x3F; p[5] = (tmid == 0);
                p[6] = b0 & 0x3F; p[7] = (b1 >> 1) & 1;
            } else if (tmid == 3) {
                uint8_t* p = w.rec(5, 7);
                if (!p) return;
                put_u32(p, sid);
                put_u16(p + 4, ((uint32_t)(b0 & 0x3F) << 6) | ((b1 >> 2) & 0x3F));
                p[6] = (b1 >> 1) & 1;
            } else {
                return;   // reserved TMId aborts the FIG (reference)
            }
        }
        i = j + 2 * nb_comp;
    }
}

void fig0_3(const uint8_t* b, int n, Writer& w) {
    int i = 0;
    while (i + 5 <= n) {
        int need = 5 + ((b[i + 1] & 1) ? 2 : 0);
        if (i + need > n) return;   // CA-org field must fit (reference)
        uint8_t* p = w.rec(6, 7);
        if (!p) return;
        put_u16(p, ((uint32_t)b[i] << 4) | ((b[i + 1] >> 4) & 0x0F));
        p[2] = (b[i + 3] >> 2) & 0x3F;
        p[3] = b[i + 2] & 0x3F;
        put_u16(p + 4, ((uint32_t)(b[i + 3] & 3) << 8) | b[i + 4]);
        p[6] = (b[i + 2] >> 7) & 1;
        i += need;
    }
}

void fig0_4(const uint8_t* b, int n, Writer& w) {
    if (n % 3 != 0) return;         // reference aborts on partial entries
    for (int i = 0; i + 2 < n; i += 3) {
        uint8_t* p = w.rec(7, 3);
        if (!p) return;
        p[0] = b[i] & 0x3F;
        put_u16(p + 1, ((uint32_t)b[i + 1] << 8) | b[i + 2]);
    }
}

void fig0_5(const uint8_t* b, int n, Writer& w) {
    int i = 0;
    while (i < n) {
        if (!((b[i] >> 7) & 1)) {
            if (i + 2 > n) break;
            uint8_t* p = w.rec(8, 5);
            if (!p) return;
            p[0] = b[i + 1]; p[1] = 1; p[2] = b[i] & 0x3F; put_u16(p + 3, 0);
            i += 2;
        } else {
            if (i + 3 > n) break;
            uint8_t* p = w.rec(8, 5);
            if (!p) return;
            p[0] = b[i + 2]; p[1] = 0; p[2] = 0;
            put_u16(p + 3, ((uint32_t)(b[i] & 0x0F) << 8) | b[i + 1]);
            i += 3;
        }
    }
}

void fig0_6(const uint8_t* b, int n, int pd, Writer& w) {
    // record 9: [flags u8][lsn u16][has_list u8][n_sid][n_rds][n_drm][ids...]
    int i = 0;
    while (i + 2 <= n) {
        int id_list_flag = (b[i] >> 7) & 1;
        uint8_t flags = (uint8_t)(((b[i] >> 6) & 1)
                                  | (((b[i] >> 5) & 1) << 1)
                                  | (((b[i] >> 4) & 1) << 2));
        int intl = (b[i] >> 4) & 1;
        uint32_t lsn = ((uint32_t)(b[i] & 0x0F) << 8) | b[i + 1];
        if (!id_list_flag) {
            uint8_t* p = w.rec(9, 7);
            if (!p) return;
            p[0] = flags; put_u16(p + 1, lsn);
            p[3] = 0; p[4] = 0; p[5] = 0; p[6] = 0;
            i += 2;
            continue;
        }
        if (i + 3 > n) break;
        int idlq = (b[i + 2] >> 5) & 3;
        int nb_ids = b[i + 2] & 0x0F;
        int j = i + 3;
        if (n - j <= 0) break;      // reference: empty list region aborts
        int step = (!pd && !intl) ? 2 : (!pd && intl) ? 3 : 4;
        if (j + step * nb_ids > n) break;
        uint32_t sids[16], rds[16], drm[16];
        int n_sid = 0, n_rds = 0, n_drm = 0;
        for (int k = 0; k < nb_ids; k++) {
            const uint8_t* e = b + j + step * k;
            uint32_t sid, rd, dr;
            if (step == 2) {
                sid = rd = dr = ((uint32_t)e[0] << 8) | e[1];
            } else if (step == 3) {
                // reference quirk: ECC and sid high byte from the same byte
                sid = ((uint32_t)e[0] << 16) | ((uint32_t)e[0] << 8) | e[1];
                rd = ((uint32_t)e[1] << 8) | e[2];
                dr = ((uint32_t)e[0] << 16) | ((uint32_t)e[1] << 8) | e[2];
            } else {
                sid = dr = ((uint32_t)e[0] << 24) | ((uint32_t)e[1] << 16)
                    | ((uint32_t)e[2] << 8) | e[3];
                rd = ((uint32_t)e[2] << 8) | e[3];
            }
            if (idlq == 0) sids[n_sid++] = sid;
            else if (idlq == 1) rds[n_rds++] = rd;
            else if (idlq == 3) drm[n_drm++] = dr;
        }
        uint8_t* p = w.rec(9, 7 + 4 * n_sid + 2 * n_rds + 4 * n_drm);
        if (!p) return;
        p[0] = flags; put_u16(p + 1, lsn);
        p[3] = 1; p[4] = (uint8_t)n_sid; p[5] = (uint8_t)n_rds;
        p[6] = (uint8_t)n_drm;
        uint8_t* q = p + 7;
        for (int k = 0; k < n_sid; k++, q += 4) put_u32(q, sids[k]);
        for (int k = 0; k < n_rds; k++, q += 2) put_u16(q, rds[k]);
        for (int k = 0; k < n_drm; k++, q += 4) put_u32(q, drm[k]);
        i = j + step * nb_ids;
    }
}

void fig0_7(const uint8_t* b, int n, Writer& w) {
    if (n != 2) return;
    uint8_t* p = w.rec(10, 3);
    if (!p) return;
    p[0] = (b[0] >> 2) & 0x3F;
    put_u16(p + 1, ((uint32_t)(b[0] & 3) << 8) | b[1]);
}

void fig0_8(const uint8_t* b, int n, int pd, Writer& w) {
    int i = 0;
    const int sid_len = pd ? 4 : 2;
    while (i < n) {
        if (i + sid_len + 2 > n) break;
        uint32_t sid = service_id(b + i, sid_len);
        int ext_flag = (b[i + sid_len] >> 7) & 1;
        uint8_t scids = b[i + sid_len] & 0x0F;
        int j = i + sid_len + 1;
        int ls_flag = (b[j] >> 7) & 1;
        int need = sid_len + 1 + (ls_flag ? 2 : 1) + (ext_flag ? 1 : 0);
        if (i + need > n) break;    // reference aborts on a partial entry
        uint8_t* p = w.rec(11, 8);
        if (!p) return;
        put_u32(p, sid); p[4] = scids;
        if (!ls_flag) {
            p[5] = 0;
            put_u16(p + 6, b[j] & 0x3F);
        } else {
            p[5] = 1;
            put_u16(p + 6, ((uint32_t)(b[j] & 0x0F) << 8) | b[j + 1]);
        }
        i += need;
    }
}

void fig0_9(const uint8_t* b, int n, Writer& w) {
    // record 12: [lto][ecc][table][has_ext][n][sids u32...]
    if (n < 3) return;
    int ext_flag = (b[0] >> 7) & 1;
    int nb_ext = n - 3;
    if (!ext_flag && nb_ext > 0) return;   // reference drops extra bytes
    if (ext_flag && nb_ext <= 0) return;
    uint32_t sids[64];
    int n_sid = 0;
    if (ext_flag) {
        int i = 3;
        while (i < n) {
            if (i + 2 > n) break;           // subfield header must fit
            int nb_services = (b[i] >> 6) & 3;
            uint8_t ecc = b[i + 1];
            int j = i + 2;
            if (j + 2 * nb_services > n) break;  // whole id list must fit
            for (int k = 0; k < nb_services; k++) {
                if (n_sid < 64)
                    sids[n_sid++] = ((uint32_t)ecc << 16)
                                  | ((uint32_t)b[j] << 8) | b[j + 1];
                j += 2;
            }
            i = j;
        }
    }
    uint8_t* p = w.rec(12, 5 + 4 * n_sid);
    if (!p) return;
    p[0] = b[0] & 0x3F; p[1] = b[1]; p[2] = b[2];
    p[3] = (uint8_t)ext_flag; p[4] = (uint8_t)n_sid;
    for (int k = 0; k < n_sid; k++) put_u32(p + 5 + 4 * k, sids[k]);
}

void fig0_10(const uint8_t* b, int n, Writer& w) {
    if (n < 4) return;
    uint32_t mjd = ((uint32_t)(b[0] & 0x7F) << 10) | ((uint32_t)b[1] << 2)
                 | ((b[2] >> 6) & 3);
    int lsi = (b[2] >> 5) & 1;
    int utc = (b[2] >> 3) & 1;
    int hours = ((b[2] & 7) << 2) | ((b[3] >> 6) & 3);
    int minutes = b[3] & 0x3F;
    int sec = 0, ms = 0;
    if (utc) {
        if (n < 6) return;       // reference aborts a truncated long form
        sec = (b[4] >> 2) & 0x3F;
        ms = ((b[4] & 3) << 8) | b[5];
    }
    uint8_t* p = w.rec(13, 11);
    if (!p) return;
    put_u32(p, mjd); p[4] = (uint8_t)hours; p[5] = (uint8_t)minutes;
    p[6] = (uint8_t)sec; put_u16(p + 7, ms);
    p[9] = (uint8_t)lsi; p[10] = (uint8_t)utc;
}

void fig0_13(const uint8_t* b, int n, int nt, int pd, Writer& w) {
    // mirrors the reference quirk: per-app bound counts from the entity
    // start, so app data may read into the FIB tail (nt >= n bytes valid)
    int i = 0;
    const int sid_len = pd ? 4 : 2;
    const int hdr = sid_len + 1;
    while (i < n) {
        if (hdr > n - i) break;
        uint32_t sid = service_id(b + i, sid_len);
        uint8_t scids = (b[i + sid_len] >> 4) & 0x0F;
        int nb_apps = b[i + sid_len] & 0x0F;
        int apps0 = i + hdr;
        int ai = 0;
        bool ok = true;
        for (int a = 0; a < nb_apps; a++) {
            int app_remain = (n - i) - ai;
            if (2 > app_remain || apps0 + ai + 2 > nt) { ok = false; break; }
            uint32_t app_type = ((uint32_t)b[apps0 + ai] << 3)
                              | ((b[apps0 + ai + 1] >> 5) & 7);
            int nb_data = b[apps0 + ai + 1] & 0x1F;
            if (2 + nb_data > app_remain
                || apps0 + ai + 2 + nb_data > nt) { ok = false; break; }
            uint8_t* p = w.rec(14, 8 + nb_data);
            if (!p) return;
            put_u32(p, sid); p[4] = scids;
            put_u16(p + 5, app_type); p[7] = (uint8_t)nb_data;
            memcpy(p + 8, b + apps0 + ai + 2, nb_data);
            ai += 2 + nb_data;
        }
        if (!ok) break;
        i += hdr + ai;
    }
}

void fig0_14(const uint8_t* b, int n, Writer& w) {
    for (int i = 0; i < n; i++) {
        uint8_t* p = w.rec(15, 2);
        if (!p) return;
        p[0] = (b[i] >> 2) & 0x3F; p[1] = b[i] & 3;
    }
}

void fig0_17(const uint8_t* b, int n, Writer& w) {
    int i = 0;
    while (i + 4 <= n) {
        uint32_t sid = ((uint32_t)b[i] << 8) | b[i + 1];
        int lang_flag = (b[i + 2] >> 5) & 1;
        int cc_flag = (b[i + 2] >> 4) & 1;
        int nb = 4 + lang_flag + cc_flag;
        if (i + nb > n) break;
        int j = i + 3;
        uint8_t lang = lang_flag ? b[j] : 0;
        j += lang_flag;
        uint8_t code = b[j] & 0x1F;
        j += 1;
        uint8_t cc = cc_flag ? b[j] : 0;
        uint8_t* p = w.rec(16, 7);
        if (!p) return;
        put_u32(p, sid); p[4] = code; p[5] = lang; p[6] = cc;
        i += nb;
    }
}

void fig0_21(const uint8_t* b, int n, int nt, Writer& w) {
    int i = 0;
    while (i < n) {
        if (2 > n - i) break;
        int nb_fi = b[i + 1] & 0x1F;
        int base = i + 2;
        int j = 0;
        while (j < nb_fi) {
            if (nb_fi - j < 3 || base + j + 3 > nt) return;
            uint32_t idv = ((uint32_t)b[base + j] << 8) | b[base + j + 1];
            int rm = (b[base + j + 2] >> 4) & 0x0F;
            int cont = (b[base + j + 2] >> 3) & 1;
            int nb_freq = b[base + j + 2] & 7;
            int f0 = base + j + 3;
            if (f0 + nb_freq > nt) return;
            const uint8_t* fl = b + f0;
            auto emit = [&](uint32_t id_value, uint32_t freq,
                            uint8_t flags) {
                uint8_t* p = w.rec(17, 11);
                if (!p) return false;
                p[0] = (uint8_t)rm; put_u32(p + 1, id_value);
                put_u32(p + 5, freq); p[9] = (uint8_t)cont;
                p[10] = flags;       // bit0 geo_adjacent, bit1 mode I
                return true;
            };
            if (rm == 0b0000) {
                if (nb_freq % 3 != 0) return;
                for (int k = 0; k + 2 < nb_freq; k += 3) {
                    // uint32 wrap + byte-swapped eid match the reference
                    uint32_t freq = ((((uint32_t)(fl[k] & 7) << 16)
                                      | ((uint32_t)fl[k + 1] << 8)
                                      | fl[k + 2]) * 16000u);
                    uint32_t eid = ((idv & 0xFF) << 8) | (idv >> 8);
                    uint8_t cf = (fl[k] >> 3) & 0x1F;
                    uint8_t flags = (uint8_t)((!(cf & 1) ? 1 : 0)
                                              | ((cf & 2) ? 2 : 0));
                    if (!emit(eid, freq, flags)) return;
                }
            } else if (rm == 0b1000) {
                for (int k = 0; k < nb_freq; k++)
                    if (!emit(idv, 87500000u + fl[k] * 100000u, 0)) return;
            } else if (rm == 0b0110) {
                if (nb_freq % 3 != 0) return;
                for (int k = 0; k + 2 < nb_freq; k += 3) {
                    uint32_t raw = ((uint32_t)(fl[k + 1] & 0x7F) << 8)
                                 | fl[k + 2];
                    uint32_t mult = (fl[k + 1] >> 7) ? 10000u : 1000u;
                    if (!emit(((uint32_t)fl[k] << 16) | idv, raw * mult, 0))
                        return;
                }
            } else if (rm == 0b1110) {
                if (nb_freq % 3 != 0) return;
                for (int k = 0; k + 2 < nb_freq; k += 3) {
                    uint32_t raw = ((uint32_t)fl[k + 1] << 8) | fl[k + 2];
                    if (!emit(((uint32_t)fl[k] << 16) | idv, raw * 1000u, 0))
                        return;
                }
            } else {
                return;              // unknown RM aborts the FIG
            }
            j += 3 + nb_freq;
        }
        i += 2 + nb_fi;
    }
}

void fig0_24(const uint8_t* b, int n, int pd, int oe, Writer& w) {
    int i = 0;
    const int sid_len = pd ? 4 : 2;
    while (i < n) {
        if (i + sid_len + 1 > n) break;
        uint32_t sid = service_id(b + i, sid_len);
        int nb_eids = b[i + sid_len] & 0x0F;
        int j = i + sid_len + 1;
        if (j + 2 * nb_eids > n) break;
        for (int k = 0; k < nb_eids; k++) {
            uint8_t* p = w.rec(18, 7);
            if (!p) return;
            put_u32(p, sid);
            put_u16(p + 4, ((uint32_t)b[j + 2 * k] << 8) | b[j + 2 * k + 1]);
            p[6] = (uint8_t)oe;
        }
        i = j + 2 * nb_eids;
    }
}

// ---- FIG type 1 (labels) ----

void emit_label(Writer& w, uint8_t kind, uint32_t idv, const uint8_t* body,
                uint8_t charset, int has_scids, uint8_t scids) {
    uint8_t* p = w.rec(19, 10 + 16);
    if (!p) return;
    p[0] = kind; put_u32(p + 1, idv);
    p[5] = (uint8_t)has_scids; p[6] = scids; p[7] = charset;
    put_u16(p + 8, ((uint32_t)body[16] << 8) | body[17]);
    memcpy(p + 10, body, 16);
}

void parse_type1(const uint8_t* buf, int n, Writer& w) {
    if (n < 1) return;
    uint8_t charset = (buf[0] >> 4) & 0x0F;
    int ext = buf[0] & 7;
    const uint8_t* b = buf + 1;
    int bn = n - 1;
    if (ext == 0 && bn == 20)
        emit_label(w, 0, ((uint32_t)b[0] << 8) | b[1], b + 2, charset, 0, 0);
    else if (ext == 1 && bn == 20)
        emit_label(w, 1, ((uint32_t)b[0] << 8) | b[1], b + 2, charset, 0, 0);
    else if (ext == 5 && bn == 22)
        emit_label(w, 1, service_id(b, 4), b + 4, charset, 0, 0);
    else if (ext == 4 && bn >= 1) {
        int pd = (b[0] >> 7) & 1;
        uint8_t scids = b[0] & 0x0F;
        int sid_len = pd ? 4 : 2;
        if (bn == 1 + sid_len + 18)
            emit_label(w, 2, service_id(b + 1, sid_len), b + 1 + sid_len,
                       charset, 1, scids);
    }
}

void parse_type0(const uint8_t* buf, int n, int nt, Writer& w) {
    if (n < 1) return;
    int oe = (buf[0] >> 6) & 1;
    int pd = (buf[0] >> 5) & 1;
    int ext = buf[0] & 0x1F;
    const uint8_t* b = buf + 1;
    int bn = n - 1;
    int bt = nt - 1;
    switch (ext) {
        case 0: fig0_0(b, bn, w); break;
        case 1: fig0_1(b, bn, w); break;
        case 2: fig0_2(b, bn, pd, w); break;
        case 3: fig0_3(b, bn, w); break;
        case 4: fig0_4(b, bn, w); break;
        case 5: fig0_5(b, bn, w); break;
        case 6: fig0_6(b, bn, pd, w); break;
        case 7: fig0_7(b, bn, w); break;
        case 8: fig0_8(b, bn, pd, w); break;
        case 9: fig0_9(b, bn, w); break;
        case 10: fig0_10(b, bn, w); break;
        case 13: fig0_13(b, bn, bt, pd, w); break;
        case 14: fig0_14(b, bn, w); break;
        case 17: fig0_17(b, bn, w); break;
        case 21: fig0_21(b, bn, bt, w); break;
        case 24: fig0_24(b, bn, pd, oe, w); break;
        default: break;
    }
}

}  // namespace

extern "C" {

// Parse one FIB data payload (normally 30 bytes). Writes packed event
// records into out; returns bytes written, or -1 on output overflow.
int64_t fig_parse(const uint8_t* fib, int64_t n, uint8_t* out, int64_t cap) {
    Writer w{out, cap};
    int64_t i = 0;
    while (i < n) {
        uint8_t header = fib[i];
        if (header == 0xFF) break;
        int fig_type = (header >> 5) & 7;
        int data_len = header & 0x1F;
        if (i + 1 + data_len > n) break;
        const uint8_t* body = fib + i + 1;
        int tail_len = (int)(n - (i + 1));
        i += 1 + data_len;
        if (fig_type == 0) parse_type0(body, data_len, tail_len, w);
        else if (fig_type == 1) parse_type1(body, data_len, w);
        else if (fig_type == 2 || fig_type == 6) continue;
        else break;   // type 7 terminator or unsupported
        if (w.overflow) return -1;
    }
    return w.overflow ? -1 : w.pos;
}

}  // extern "C"
