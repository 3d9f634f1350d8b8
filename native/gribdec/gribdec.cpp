// gribdec: minimal-dependency GRIB1/GRIB2 decoder for flexpart_tpu.
//
// The reference consumes ECMWF/NCEP GRIB through the eccodes Fortran API
// (readwind_ecmwf.f90:50); this is a from-scratch native decoder for the
// encodings those archives actually use:
//   * GRIB1: simple packing, regular lat/lon grid, PV coefficients in
//     the GDS;
//   * GRIB2: data representation templates 5.0 (simple packing),
//     5.2/5.3 (complex packing, optional spatial differencing) and
//     5.42 (CCSDS/AEC via libaec), grid definition template 3.0,
//     product definition templates 4.x with hybrid-coordinate values in
//     section 4; bitmaps (section 6 / GRIB1 BMS).
//
// Exposed as a small C API consumed through ctypes (io/gribmet.py).
// Build: make -C native/gribdec  ->  libgribdec.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>
#include <string>

#if defined(HAVE_LIBAEC)
// minimal libaec ABI declarations (the image ships libaec.so.0 without
// its development header; this struct layout is the stable public ABI)
extern "C" {
struct internal_state;
typedef struct {
    const unsigned char *next_in;
    size_t avail_in;
    size_t total_in;
    unsigned char *next_out;
    size_t avail_out;
    size_t total_out;
    unsigned int bits_per_sample;
    unsigned int block_size;
    unsigned int rsi;
    unsigned int flags;
    struct internal_state *state;
} aec_stream;
#define AEC_OK 0
#define AEC_FLUSH 1
int aec_decode_init(aec_stream *strm);
int aec_decode(aec_stream *strm, int flush);
int aec_decode_end(aec_stream *strm);
}
#endif

namespace {

struct Reader {
    const uint8_t* p;
    size_t n;
    size_t off = 0;
    bool ok = true;

    uint64_t bytes(int k) {
        if (off + k > n) { ok = false; return 0; }
        uint64_t v = 0;
        for (int i = 0; i < k; i++) v = (v << 8) | p[off + i];
        off += k;
        return v;
    }
    int64_t sbytes(int k) {  // sign-magnitude (GRIB convention)
        uint64_t v = bytes(k);
        uint64_t sign = 1ull << (8 * k - 1);
        return (v & sign) ? -(int64_t)(v & (sign - 1)) : (int64_t)v;
    }
    void skip(size_t k) { off += k; if (off > n) ok = false; }
};

// IBM 32-bit float (GRIB1 reference values)
double ibm2double(uint32_t v) {
    int sign = (v >> 31) ? -1 : 1;
    int exp = (int)((v >> 24) & 0x7f) - 64;
    double mant = (double)(v & 0xffffff) / 16777216.0;
    return sign * mant * std::pow(16.0, exp);
}

// IEEE 32-bit from big-endian word
float ieee2float(uint32_t v) {
    float f;
    std::memcpy(&f, &v, 4);
    return f;
}

struct BitReader {
    const uint8_t* p;
    size_t nbits;
    size_t pos = 0;
    uint64_t get(int w) {
        uint64_t v = 0;
        for (int i = 0; i < w; i++) {
            size_t b = pos + i;
            v = (v << 1) | ((p[b >> 3] >> (7 - (b & 7))) & 1);
        }
        pos += w;
        return v;
    }
    int64_t gets(int w) {  // sign-magnitude signed
        if (w == 0) return 0;
        uint64_t v = get(w);
        uint64_t sign = 1ull << (w - 1);
        return (v & sign) ? -(int64_t)(v & (sign - 1)) : (int64_t)v;
    }
};

struct MsgInfo {
    int64_t edition = 0;
    int64_t param = 0;        // g1: indicator; g2: disc*1000000+cat*1000+num
    int64_t level_type = 0;
    int64_t level = 0;
    int64_t nx = 0, ny = 0;
    double lat1 = 0, lon1 = 0, lat2 = 0, lon2 = 0, dlat = 0, dlon = 0;
    int64_t npv = 0;
    int64_t npoints = 0;
    int64_t date = 0, time = 0;   // YYYYMMDD, HHMM
    int64_t step = 0;             // forecast step (hours if unit==1)
};

struct Section { size_t off; size_t len; int num; };

bool parse_grib2_sections(const uint8_t* msg, size_t len,
                          std::vector<Section>& secs) {
    size_t off = 16;  // after section 0
    while (off + 4 <= len) {
        if (len - off == 4 && std::memcmp(msg + off, "7777", 4) == 0)
            return true;
        uint32_t slen = (msg[off] << 24) | (msg[off + 1] << 16)
            | (msg[off + 2] << 8) | msg[off + 3];
        if (slen < 5 || off + slen > len) return false;
        secs.push_back({off, slen, msg[off + 4]});
        off += slen;
    }
    return false;
}

// ---- GRIB2 data decoding ----

bool decode_g2_simple(Reader drs, const uint8_t* data, size_t dlen,
                      int64_t npoints, const uint8_t* bitmap,
                      std::vector<double>& out) {
    drs.skip(11);
    uint32_t rword = (uint32_t)drs.bytes(4);
    double R = ieee2float(rword);
    int64_t E = drs.sbytes(2);
    int64_t D = drs.sbytes(2);
    int nbits = (int)drs.bytes(1);
    double e2 = std::pow(2.0, (double)E);
    double d10 = std::pow(10.0, -(double)D);
    BitReader br{data, dlen * 8};
    out.assign(npoints, NAN);
    for (int64_t i = 0; i < npoints; i++) {
        if (bitmap && !((bitmap[i >> 3] >> (7 - (i & 7))) & 1)) continue;
        double x = nbits ? (double)br.get(nbits) : 0.0;
        out[i] = (R + x * e2) * d10;
    }
    return true;
}

bool decode_g2_complex(Reader drs, const uint8_t* data, size_t dlen,
                       int64_t npoints, const uint8_t* bitmap,
                       int tmpl, std::vector<double>& out) {
    drs.skip(11);
    double R = ieee2float((uint32_t)drs.bytes(4));
    int64_t E = drs.sbytes(2);
    int64_t D = drs.sbytes(2);
    int nbits = (int)drs.bytes(1);
    drs.skip(1);              // type of original field
    int splitting = (int)drs.bytes(1);
    int missing_mgmt = (int)drs.bytes(1);
    drs.skip(8);              // primary+secondary missing substitutes
    int64_t NG = drs.bytes(4);
    int ref_group_width = (int)drs.bytes(1);
    int nbits_gwidth = (int)drs.bytes(1);
    int64_t ref_group_len = drs.bytes(4);
    int len_inc = (int)drs.bytes(1);
    int64_t last_len = drs.bytes(4);
    int nbits_glen = (int)drs.bytes(1);
    int order = 0, extra_octets = 0;
    if (tmpl == 3) {
        order = (int)drs.bytes(1);
        extra_octets = (int)drs.bytes(1);
    }
    (void)splitting;
    if (missing_mgmt != 0) return false;  // not used by ECMWF/NCEP fields

    double e2 = std::pow(2.0, (double)E);
    double d10 = std::pow(10.0, -(double)D);

    BitReader br{data, dlen * 8};
    int64_t h1 = 0, h2 = 0, hmin = 0;
    if (tmpl == 3 && order >= 1) {
        int w = 8 * extra_octets;
        h1 = br.gets(w);
        if (order == 2) h2 = br.gets(w);
        hmin = br.gets(w);
    }
    std::vector<int64_t> gref(NG), gwidth(NG), glen(NG);
    for (int64_t g = 0; g < NG; g++) gref[g] = (int64_t)br.get(nbits);
    br.pos = (br.pos + 7) & ~size_t(7);
    for (int64_t g = 0; g < NG; g++)
        gwidth[g] = ref_group_width + (int64_t)br.get(nbits_gwidth);
    br.pos = (br.pos + 7) & ~size_t(7);
    for (int64_t g = 0; g < NG; g++)
        glen[g] = ref_group_len + len_inc * (int64_t)br.get(nbits_glen);
    if (NG > 0) glen[NG - 1] = last_len;
    br.pos = (br.pos + 7) & ~size_t(7);

    std::vector<int64_t> vals;
    vals.reserve(npoints);
    for (int64_t g = 0; g < NG; g++)
        for (int64_t j = 0; j < glen[g]; j++)
            vals.push_back(gref[g] + (int64_t)br.get((int)gwidth[g]));

    // undo spatial differencing (template 5.3)
    if (tmpl == 3 && order >= 1 && !vals.empty()) {
        for (auto& v : vals) v += hmin;
        if (order == 1) {
            vals[0] = h1;
            for (size_t i = 1; i < vals.size(); i++) vals[i] += vals[i - 1];
        } else {
            if (vals.size() > 0) vals[0] = h1;
            if (vals.size() > 1) vals[1] = h2;
            for (size_t i = 2; i < vals.size(); i++)
                vals[i] += 2 * vals[i - 1] - vals[i - 2];
        }
    }

    out.assign(npoints, NAN);
    size_t k = 0;
    for (int64_t i = 0; i < npoints; i++) {
        if (bitmap && !((bitmap[i >> 3] >> (7 - (i & 7))) & 1)) continue;
        if (k >= vals.size()) break;
        out[i] = (R + (double)vals[k++] * e2) * d10;
    }
    return true;
}

#if defined(HAVE_LIBAEC)
bool decode_g2_ccsds(Reader drs, const uint8_t* data, size_t dlen,
                     int64_t npoints, const uint8_t* bitmap,
                     std::vector<double>& out) {
    drs.skip(11);
    double R = ieee2float((uint32_t)drs.bytes(4));
    int64_t E = drs.sbytes(2);
    int64_t D = drs.sbytes(2);
    int nbits = (int)drs.bytes(1);
    drs.skip(1);
    int flags = (int)drs.bytes(1);
    int block_size = (int)drs.bytes(1);
    int rsi = (int)drs.bytes(2);
    double e2 = std::pow(2.0, (double)E);
    double d10 = std::pow(10.0, -(double)D);

    int nbytes = (nbits + 7) / 8;
    std::vector<uint8_t> raw((size_t)npoints * nbytes);
    aec_stream st{};
    st.bits_per_sample = nbits;
    st.block_size = block_size;
    st.rsi = rsi;
    st.flags = flags;
    st.next_in = data;
    st.avail_in = dlen;
    st.next_out = raw.data();
    st.avail_out = raw.size();
    if (aec_decode_init(&st) != AEC_OK) return false;
    int rc = aec_decode(&st, AEC_FLUSH);
    aec_decode_end(&st);
    if (rc != AEC_OK) return false;

    out.assign(npoints, NAN);
    size_t k = 0;
    for (int64_t i = 0; i < npoints; i++) {
        if (bitmap && !((bitmap[i >> 3] >> (7 - (i & 7))) & 1)) continue;
        uint64_t v = 0;
        for (int b = 0; b < nbytes; b++) v = (v << 8) | raw[k * nbytes + b];
        k++;
        out[i] = (R + (double)v * e2) * d10;
    }
    return true;
}
#endif

// parse one message starting at msg (length len); fills info; optionally
// decodes values into out (size npoints) and pv coefficients
bool parse_message(const uint8_t* msg, size_t len, MsgInfo& info,
                   std::vector<double>* out, std::vector<double>* pv) {
    if (len < 16 || std::memcmp(msg, "GRIB", 4) != 0) return false;
    int edition = msg[7];
    info.edition = edition;

    if (edition == 1) {
        size_t off = 8;
        // --- PDS ---
        Reader pds{msg + off, len - off};
        uint32_t pds_len = (uint32_t)pds.bytes(3);
        pds.bytes(1);                       // table version
        pds.bytes(1);                       // centre
        pds.bytes(1);                       // generating process
        pds.bytes(1);                       // grid id
        int flags = (int)pds.bytes(1);
        info.param = (int64_t)pds.bytes(1);
        info.level_type = (int64_t)pds.bytes(1);
        info.level = (int64_t)pds.bytes(2);
        int yy = (int)pds.bytes(1), mm = (int)pds.bytes(1);
        int dd = (int)pds.bytes(1), hh = (int)pds.bytes(1);
        int mi = (int)pds.bytes(1);
        pds.bytes(1);                       // time unit
        int p1 = (int)pds.bytes(1);
        pds.bytes(1);                       // p2
        pds.bytes(1);                       // time range
        pds.skip(3);                        // octets 22-24
        int century = (int)pds.bytes(1);
        info.date = ((int64_t)(century - 1) * 100 + yy) * 10000
            + mm * 100 + dd;
        info.time = hh * 100 + mi;
        info.step = p1;
        bool has_gds = flags & 0x80;
        bool has_bms = flags & 0x40;
        off += pds_len;

        const uint8_t* bitmap = nullptr;
        if (!has_gds) return false;
        // --- GDS ---
        Reader gds{msg + off, len - off};
        uint32_t gds_len = (uint32_t)gds.bytes(3);
        int nv = (int)gds.bytes(1);
        int pvloc = (int)gds.bytes(1);
        int gtype = (int)gds.bytes(1);
        if (gtype != 0 && gtype != 10) return false;  // lat/lon only
        info.nx = (int64_t)gds.bytes(2);
        info.ny = (int64_t)gds.bytes(2);
        info.lat1 = gds.sbytes(3) / 1000.0;
        info.lon1 = gds.sbytes(3) / 1000.0;
        gds.bytes(1);
        info.lat2 = gds.sbytes(3) / 1000.0;
        info.lon2 = gds.sbytes(3) / 1000.0;
        info.dlon = gds.bytes(2) / 1000.0;
        info.dlat = gds.bytes(2) / 1000.0;
        info.npoints = info.nx * info.ny;
        info.npv = nv;
        if (pv && nv > 0 && pvloc > 0) {
            Reader pvr{msg + off + pvloc - 1,
                       (size_t)gds_len - (pvloc - 1)};
            pv->clear();
            for (int i = 0; i < nv; i++)
                pv->push_back(ibm2double((uint32_t)pvr.bytes(4)));
        }
        off += gds_len;
        // --- BMS ---
        std::vector<uint8_t> bms_store;
        if (has_bms) {
            Reader bms{msg + off, len - off};
            uint32_t bms_len = (uint32_t)bms.bytes(3);
            bms.bytes(1);
            uint16_t table = (uint16_t)bms.bytes(2);
            if (table == 0) {
                bms_store.assign(msg + off + 6, msg + off + bms_len);
                bitmap = bms_store.data();
            }
            off += bms_len;
        }
        if (!out) return true;
        // --- BDS (simple packing) ---
        Reader bds{msg + off, len - off};
        uint32_t bds_len = (uint32_t)bds.bytes(3);
        int bflags = (int)bds.bytes(1);
        if (bflags & 0xC0) return false;    // only grid simple packing
        int64_t E = bds.sbytes(2);
        double R = ibm2double((uint32_t)bds.bytes(4));
        int nbits = (int)bds.bytes(1);
        double e2 = std::pow(2.0, (double)E);
        BitReader br{msg + off + 11, (bds_len - 11) * 8};
        out->assign(info.npoints, NAN);
        for (int64_t i = 0; i < info.npoints; i++) {
            if (bitmap && !((bitmap[i >> 3] >> (7 - (i & 7))) & 1))
                continue;
            double x = nbits ? (double)br.get(nbits) : 0.0;
            (*out)[i] = R + x * e2;
        }
        return true;
    }

    if (edition != 2) return false;
    std::vector<Section> secs;
    if (!parse_grib2_sections(msg, len, secs)) return false;

    int discipline = msg[6];
    const uint8_t* bitmap = nullptr;
    int drs_tmpl = -1;
    Reader drs{nullptr, 0};
    const uint8_t* data = nullptr;
    size_t dlen = 0;

    for (auto& s : secs) {
        Reader r{msg + s.off + 5, s.len - 5};
        switch (s.num) {
        case 1: {                                    // identification
            r.skip(2 + 2 + 1 + 1 + 1);
            int yr = (int)r.bytes(2), mo = (int)r.bytes(1);
            int dy = (int)r.bytes(1), hr = (int)r.bytes(1);
            int mi = (int)r.bytes(1);
            info.date = (int64_t)yr * 10000 + mo * 100 + dy;
            info.time = hr * 100 + mi;
            break;
        }
        case 3: {                                    // grid definition
            r.skip(1);
            r.bytes(4);                              // npoints (recompute)
            r.skip(2);
            int tmpl = (int)r.bytes(2);
            if (tmpl != 0) return false;             // regular lat/lon
            r.skip(16);                              // earth shape octets 15-30
            info.nx = (int64_t)r.bytes(4);
            info.ny = (int64_t)r.bytes(4);
            r.skip(8);                               // basic angle+subdiv
            info.lat1 = r.sbytes(4) / 1e6;
            info.lon1 = r.sbytes(4) / 1e6;
            r.skip(1);
            info.lat2 = r.sbytes(4) / 1e6;
            info.lon2 = r.sbytes(4) / 1e6;
            info.dlon = r.bytes(4) / 1e6;
            info.dlat = r.bytes(4) / 1e6;
            info.npoints = info.nx * info.ny;
            break;
        }
        case 4: {                                    // product definition
            int nv = (int)r.bytes(2);
            int tmpl = (int)r.bytes(2);
            int cat = (int)r.bytes(1);
            int num = (int)r.bytes(1);
            // disc*1e6 + cat*1e3 + num: each component is one octet
            // (0..255), so a 1000 radix keeps parameterNumber>=100
            // (e.g. NCEP CPRAT 0,1,196) unambiguous.
            info.param = (int64_t)discipline * 1000000 + cat * 1000 + num;
            r.skip(3 + 2 + 1 + 1);                   // octets 12-18
            r.skip(4);                               // forecast time
            int lt1 = (int)r.bytes(1);
            int sf1 = (int)r.bytes(1);
            int64_t sv1 = (int64_t)r.bytes(4);
            info.level_type = lt1;
            info.level = (int64_t)(sv1 / std::pow(10.0, sf1));
            info.npv = nv;
            if (pv && nv > 0) {
                // coordinate values trail the template (IEEE floats)
                size_t pvoff = s.off + s.len - (size_t)nv * 4;
                Reader pvr{msg + pvoff, (size_t)nv * 4};
                pv->clear();
                for (int i = 0; i < nv; i++)
                    pv->push_back(ieee2float((uint32_t)pvr.bytes(4)));
            }
            (void)tmpl;
            break;
        }
        case 5:
            r.bytes(4);
            drs_tmpl = (int)r.bytes(2);
            drs = Reader{msg + s.off, s.len};
            break;
        case 6: {
            int ind = (int)r.bytes(1);
            if (ind == 0) bitmap = msg + s.off + 6;
            break;
        }
        case 7:
            data = msg + s.off + 5;
            dlen = s.len - 5;
            break;
        default:
            break;
        }
    }
    if (!out) return true;
    if (drs_tmpl == 0)
        return decode_g2_simple(drs, data, dlen, info.npoints, bitmap,
                                *out);
    if (drs_tmpl == 2 || drs_tmpl == 3)
        return decode_g2_complex(drs, data, dlen, info.npoints, bitmap,
                                 drs_tmpl, *out);
#if defined(HAVE_LIBAEC)
    if (drs_tmpl == 42)
        return decode_g2_ccsds(drs, data, dlen, info.npoints, bitmap,
                               *out);
#endif
    return false;
}

std::vector<uint8_t> read_file(const char* path) {
    std::vector<uint8_t> buf;
    FILE* f = std::fopen(path, "rb");
    if (!f) return buf;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    buf.resize(n);
    if (std::fread(buf.data(), 1, n, f) != (size_t)n) buf.clear();
    std::fclose(f);
    return buf;
}

size_t message_length(const uint8_t* p, size_t avail) {
    if (avail < 16 || std::memcmp(p, "GRIB", 4) != 0) return 0;
    if (p[7] == 1) {
        return ((size_t)p[4] << 16) | ((size_t)p[5] << 8) | p[6];
    }
    if (p[7] == 2) {
        uint64_t v = 0;
        for (int i = 8; i < 16; i++) v = (v << 8) | p[i];
        return (size_t)v;
    }
    return 0;
}

}  // namespace

extern "C" {

// scan: fill offsets/lengths of up to max messages; return count
long gribdec_scan(const char* path, long* offsets, long* lengths,
                  long max) {
    auto buf = read_file(path);
    long count = 0;
    size_t off = 0;
    while (off + 16 <= buf.size() && count < max) {
        if (std::memcmp(buf.data() + off, "GRIB", 4) == 0) {
            size_t len = message_length(buf.data() + off,
                                        buf.size() - off);
            if (len == 0 || off + len > buf.size()) break;
            offsets[count] = (long)off;
            lengths[count] = (long)len;
            count++;
            off += len;
        } else {
            off++;
        }
    }
    return count;
}

// info: fields written into a flat int64/double struct pair
long gribdec_info(const char* path, long offset, long length,
                  long long* ivals /*10*/, double* dvals /*6*/,
                  double* pv, long maxpv) {
    auto buf = read_file(path);
    if (offset + length > (long)buf.size()) return -1;
    MsgInfo info;
    std::vector<double> pvv;
    if (!parse_message(buf.data() + offset, length, info, nullptr, &pvv))
        return -2;
    ivals[0] = info.edition;
    ivals[1] = info.param;
    ivals[2] = info.level_type;
    ivals[3] = info.level;
    ivals[4] = info.nx;
    ivals[5] = info.ny;
    ivals[6] = info.npv;
    ivals[7] = info.date;
    ivals[8] = info.time;
    ivals[9] = info.step;
    dvals[0] = info.lat1;
    dvals[1] = info.lon1;
    dvals[2] = info.lat2;
    dvals[3] = info.lon2;
    dvals[4] = info.dlat;
    dvals[5] = info.dlon;
    long n = (long)std::min((size_t)maxpv, pvv.size());
    for (long i = 0; i < n; i++) pv[i] = pvv[i];
    return n;
}

// decode values (row-major as stored); returns npoints or <0 on error
long gribdec_decode(const char* path, long offset, long length,
                    double* out, long maxn) {
    auto buf = read_file(path);
    if (offset + length > (long)buf.size()) return -1;
    MsgInfo info;
    std::vector<double> vals;
    if (!parse_message(buf.data() + offset, length, info, &vals, nullptr))
        return -2;
    long n = (long)std::min((size_t)maxn, vals.size());
    for (long i = 0; i < n; i++) out[i] = vals[i];
    return n;
}

}  // extern "C"
