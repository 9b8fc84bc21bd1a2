// Native CSV ingest: one-pass parse -> site index -> dense (T, S) matrix.
//
// This is the framework's native data-loader runtime component. The
// reference's ingest is pandas + a per-row Python loop
// (stnf/dataio/kaust_loader.py:36-76); here a single C++ pass tokenizes the
// file, builds the first-appearance site index over exact (x, y) bit
// patterns, and scatters z into the dense matrix. Exposed through a plain C
// ABI consumed via ctypes (st_dadk_tpu/dataio/native.py).
//
// Semantics contract (must match the Python loader bit-for-bit):
//   - sites are unique (x, y) float pairs in order of first appearance
//   - t column is 1-based; missing t column => T = 1
//   - cells never written stay NaN
//   - an extra leading id column and quoted headers are tolerated

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// Sites are keyed on the FLOAT64 bit patterns of (x, y) — the same values
// pandas factorize sees — so coordinates distinct only beyond float32
// precision stay distinct sites and site_to_idx keys match the CSV's doubles
// exactly (ADVICE r1: float32 keys silently merged sites and broke
// predictions_to_csv lookups).
struct XY {
    uint64_t xb, yb;
    bool operator==(const XY& o) const { return xb == o.xb && yb == o.yb; }
};

inline uint64_t mix64(uint64_t v) {
    // splitmix64 finalizer
    v += 0x9e3779b97f4a7c15ULL;
    v = (v ^ (v >> 30)) * 0xbf58476d1ce4e5b9ULL;
    v = (v ^ (v >> 27)) * 0x94d049bb133111ebULL;
    return v ^ (v >> 31);
}

struct XYHash {
    size_t operator()(const XY& k) const {
        return size_t(mix64(k.xb ^ mix64(k.yb)));
    }
};

inline uint64_t f64_bits(double f) {
    uint64_t b;
    std::memcpy(&b, &f, sizeof(b));
    return b;
}

// split a header line into lowercase, unquoted column names
std::vector<std::string> parse_header(const char* line, size_t len) {
    std::vector<std::string> cols;
    std::string cur;
    for (size_t i = 0; i <= len; ++i) {
        char c = (i < len) ? line[i] : ',';
        if (c == ',' || c == '\n' || c == '\r') {
            if (c == ',' || i == len) {
                cols.push_back(cur);
                cur.clear();
            }
        } else if (c != '"' && c != ' ') {
            cur.push_back(char(std::tolower(c)));
        }
    }
    while (!cols.empty() && cols.back().empty()) cols.pop_back();
    return cols;
}

}  // namespace

extern "C" {

// Returns 0 on success. Caller frees z_out/coords_out with stdadk_free.
//   z_out      : T*S floats (row-major, NaN-initialized)
//   coords_out : S*2 doubles (exact parsed values; caller downcasts for
//                device arrays, keeps doubles for the site index)
int stdadk_load_csv(const char* path, float** z_out, double** coords_out,
                    int64_t* T_out, int64_t* S_out, int64_t* rows_out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<char> buf(size_t(size) + 1);
    if (std::fread(buf.data(), 1, size_t(size), f) != size_t(size)) {
        std::fclose(f);
        return 2;
    }
    std::fclose(f);
    buf[size_t(size)] = '\0';

    const char* p = buf.data();
    const char* end = p + size;

    // header
    const char* nl = static_cast<const char*>(std::memchr(p, '\n', size_t(end - p)));
    if (!nl) return 3;
    auto cols = parse_header(p, size_t(nl - p));
    int ix = -1, iy = -1, it = -1, iz = -1;
    for (size_t c = 0; c < cols.size(); ++c) {
        if (cols[c] == "x") ix = int(c);
        else if (cols[c] == "y") iy = int(c);
        else if (cols[c] == "t") it = int(c);
        else if (cols[c] == "z") iz = int(c);
    }
    if (ix < 0 || iy < 0) return 4;
    int ncols = int(cols.size());
    p = nl + 1;

    // first pass: parse every row into flat arrays (x/y kept as the exact
    // parsed doubles so the site index matches pandas factorize semantics)
    std::vector<double> xs, ys;
    std::vector<float> zs;
    std::vector<int64_t> ts;
    xs.reserve(1 << 17); ys.reserve(1 << 17);
    std::vector<double> vals(static_cast<size_t>(ncols));  // sized by header, no column cap
    int64_t t_max = 1;
    while (p < end) {
        if (*p == '\n' || *p == '\r') { ++p; continue; }
        int c = 0;
        while (c < ncols && p < end && *p != '\n' && *p != '\r') {
            // Find the field's end BEFORE strtod: strtod treats '\n' as
            // leading whitespace, so an empty trailing field ("...,3,\n")
            // would otherwise parse the NEXT line's first value and swallow
            // that row. Bounding the parse at the field end makes
            // empty/garbage fields (mid-row or end-of-row) NaN as the
            // contract above promises.
            const char* fend = p;
            while (fend < end && *fend != ',' && *fend != '\n' && *fend != '\r')
                ++fend;
            char* next = nullptr;
            double v = std::strtod(p, &next);
            vals[size_t(c)] = (next == p || next > fend) ? NAN : v;
            ++c;
            p = fend;
            if (p < end && *p == ',') ++p;
            else break;
        }
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p;
        if (c <= (ix > iy ? ix : iy)) continue;
        xs.push_back(vals[ix]);
        ys.push_back(vals[iy]);
        if (it >= 0 && it < c) {
            int64_t tv = int64_t(vals[it]);
            ts.push_back(tv);
            if (tv > t_max) t_max = tv;
        } else {
            ts.push_back(1);
        }
        zs.push_back((iz >= 0 && iz < c) ? float(vals[iz]) : NAN);
    }

    const int64_t n = int64_t(xs.size());
    // site index: first-appearance order over exact float64 bit patterns
    std::unordered_map<XY, int32_t, XYHash> site_index;
    site_index.reserve(size_t(n));
    std::vector<int32_t> codes(static_cast<size_t>(n));
    std::vector<double> coords;
    coords.reserve(4096);
    for (int64_t i = 0; i < n; ++i) {
        XY key{f64_bits(xs[size_t(i)]), f64_bits(ys[size_t(i)])};
        auto ins = site_index.emplace(key, int32_t(site_index.size()));
        if (ins.second) {
            coords.push_back(xs[size_t(i)]);
            coords.push_back(ys[size_t(i)]);
        }
        codes[size_t(i)] = ins.first->second;
    }

    const int64_t S = int64_t(site_index.size());
    const int64_t T = (it >= 0) ? t_max : 1;
    float* z = static_cast<float*>(std::malloc(sizeof(float) * size_t(T * S)));
    double* cd = static_cast<double*>(std::malloc(sizeof(double) * size_t(S * 2)));
    if (!z || !cd) { std::free(z); std::free(cd); return 5; }
    for (int64_t i = 0; i < T * S; ++i) z[i] = NAN;
    std::memcpy(cd, coords.data(), sizeof(double) * size_t(S * 2));
    for (int64_t i = 0; i < n; ++i) {
        int64_t t_idx = ts[size_t(i)] - 1;
        if (t_idx < 0 || t_idx >= T) continue;
        z[t_idx * S + codes[size_t(i)]] = zs[size_t(i)];
    }

    *z_out = z;
    *coords_out = cd;
    *T_out = T;
    *S_out = S;
    *rows_out = n;
    return 0;
}

void stdadk_free(void* ptr) { std::free(ptr); }

}  // extern "C"
