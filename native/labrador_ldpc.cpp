// labrador_ldpc_tpu native scalar codec.
//
// Host-side C++ implementation of the nine CCSDS LDPC codes' encoder and
// decoders, exposed through the C API in labrador_ldpc.h. Semantics mirror
// the reference crate's algorithms (self-corrected min-sum per
// src/decoder.rs:347-475, Gallager bit-flipping per src/decoder.rs:243-301,
// erasure repair per src/decoder.rs:144-223, systematic circulant encode per
// src/encoder.rs:190-252) but the implementation is fresh: H edges are
// expanded once per code from the compact prototype constants and cached,
// rather than re-derived lazily per sweep — hosted targets trade a few
// hundred KB for branch-free hot loops.
//
// Thread-safety: the per-code tables are built under std::call_once; all
// API entry points are reentrant given distinct caller buffers.

#include "labrador_ldpc.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <limits>
#include <mutex>
#include <vector>

#include "constants_data.inc"

namespace {

constexpr int HI_TAG = 1 << 6;
constexpr int HP_TAG = 2 << 6;
constexpr int KIND_MASK = HP_TAG | HI_TAG;
constexpr int VAL_MASK = 0x3F;

struct CodeTables {
    // edge list in the reference's deterministic iteration order
    // (src/codes/mod.rs:294-362): (check, var) pairs.
    std::vector<int32_t> edge_check;
    std::vector<int32_t> edge_var;
    // dense generator parity block, row-major (k x (n-k)/64) u64 words,
    // MSB-first bit order within each word
    std::vector<uint64_t> g_parity;
};

int phi_m_index(int m) {
    for (int i = 0; i < 7; ++i)
        if (PHI_M_VALUES[i] == m) return i;
    return -1;
}

void expand_edges(int code, CodeTables &t) {
    const CodeParams &p = CODE_PARAMS[code];
    const int m = p.submatrix_size;
    const int mi = phi_m_index(m);
    const int rows = (p.n + p.punctured_bits - p.k) / m;
    const int cols = (p.n + p.punctured_bits) / m;
    t.edge_check.reserve(p.paritycheck_sum);
    t.edge_var.reserve(p.paritycheck_sum);
    for (int r = 0; r < rows; ++r) {
        for (int c = 0; c < cols; ++c) {
            for (int plane = 0; plane < 3; ++plane) {
                const int cell = PROTOTYPES[code][plane][r][c];
                if (cell == 0) break;  // plane chain ends
                const int kind = cell & KIND_MASK;
                const int val = cell & VAL_MASK;
                if (kind == HI_TAG) {
                    for (int i = 0; i < m; ++i) {
                        t.edge_check.push_back(r * m + i);
                        t.edge_var.push_back(c * m + ((i + val) & (m - 1)));
                    }
                } else if (kind == HP_TAG) {
                    // pi_k(i) = (M/4)((theta_k + 4i/M) mod 4)
                    //           + (phi_k(4i/M, M) + i) mod (M/4)
                    // (compact_parity_checks.rs:107-108)
                    const int q = m / 4;
                    for (int i = 0; i < m; ++i) {
                        const int j = i / q;
                        const int pi =
                            q * ((THETA_K[val] + j) % 4) + (PHI_J_K[mi][j][val] + i) % q;
                        t.edge_check.push_back(r * m + i);
                        t.edge_var.push_back(c * m + pi);
                    }
                }
            }
        }
    }
}

void expand_generator(int code, CodeTables &t) {
    const CodeParams &p = CODE_PARAMS[code];
    const int k = p.k, r = p.n - p.k, b = p.circulant_size;
    const int crows = k / b, row_u64 = r / 64;
    const unsigned long long *g = COMPACT_G + COMPACT_G_OFF[code];
    t.g_parity.assign(static_cast<size_t>(k) * row_u64, 0);
    // compact row bits, MSB-first within each u64 (codes/mod.rs:11-19)
    std::vector<uint8_t> compact(static_cast<size_t>(crows) * r);
    for (int cr = 0; cr < crows; ++cr)
        for (int w = 0; w < row_u64; ++w) {
            unsigned long long word = g[cr * row_u64 + w];
            for (int bit = 0; bit < 64; ++bit)
                compact[cr * r + w * 64 + bit] = (word >> (63 - bit)) & 1;
        }
    // G row (cr*b + o) = compact row cr right-rotated by o within each b-bit
    // block (encoder.rs:203-245); packed MSB-first into u64 words
    for (int cr = 0; cr < crows; ++cr)
        for (int o = 0; o < b; ++o) {
            uint64_t *dst = &t.g_parity[static_cast<size_t>(cr * b + o) * row_u64];
            const uint8_t *src = &compact[static_cast<size_t>(cr) * r];
            for (int blk = 0; blk < r / b; ++blk)
                for (int j = 0; j < b; ++j) {
                    const int col = blk * b + j;
                    if (src[blk * b + ((j - o + b) & (b - 1))])
                        dst[col / 64] |= 1ULL << (63 - col % 64);
                }
        }
}

const CodeTables &tables(int code) {
    static CodeTables cache[9];
    static std::once_flag built[9];
    std::call_once(built[code], [code] {
        expand_edges(code, cache[code]);
        expand_generator(code, cache[code]);
    });
    return cache[code];
}

inline int get_bit(const uint8_t *bytes, size_t i) { return (bytes[i / 8] >> (7 - i % 8)) & 1; }
inline void set_bit(uint8_t *bytes, size_t i, int v) {
    const uint8_t mask = static_cast<uint8_t>(1u << (7 - i % 8));
    if (v)
        bytes[i / 8] |= mask;
    else
        bytes[i / 8] &= static_cast<uint8_t>(~mask);
}

// ---- LLR type policies (reference DecodeFrom, src/decoder.rs:42-86) -------

template <typename T> struct Ops {
    static T maxval() { return std::numeric_limits<T>::max(); }
    static T abs(T x) { return std::fabs(x); }
    static T add(T a, T b) { return a + b; }
    static T sub(T a, T b) { return a - b; }
    static bool hard(T x) { return x < 0; }
};

template <typename T, typename W> struct SatOps {
    static T maxval() { return std::numeric_limits<T>::max(); }
    static T clamp(W x) {
        const W lo = std::numeric_limits<T>::min(), hi = std::numeric_limits<T>::max();
        return static_cast<T>(std::min(hi, std::max(lo, x)));
    }
    static T abs(T x) { return clamp(std::abs(static_cast<W>(x))); }
    static T add(T a, T b) { return clamp(static_cast<W>(a) + static_cast<W>(b)); }
    static T sub(T a, T b) { return clamp(static_cast<W>(a) - static_cast<W>(b)); }
    static bool hard(T x) { return x < 0; }
};

template <> struct Ops<int8_t> : SatOps<int8_t, int32_t> {};
template <> struct Ops<int16_t> : SatOps<int16_t, int32_t> {};

// ---- min-sum (src/decoder.rs:347-475) -------------------------------------

template <typename T>
bool decode_ms_impl(int code, const T *llrs, uint8_t *output, T *working,
                    uint8_t *working_u8, size_t max_iters, size_t *iters_run) {
    using O = Ops<T>;
    const CodeParams &p = CODE_PARAMS[code];
    const CodeTables &t = tables(code);
    const int n = p.n, E = p.paritycheck_sum;
    const int Vn = p.n + p.punctured_bits, Cn = Vn - p.k;

    // working layout mirrors the reference split (decoder.rs:374-378)
    T *u = working;
    T *v = u + E;
    T *va = v + E;
    T *min1 = va + Vn;
    T *min2 = min1 + Cn;
    std::fill(u, u + 2 * E + Vn + 2 * Cn, T(0));
    uint8_t *sgns = working_u8;  // 1 bit per check
    std::memset(sgns, 0, (Cn + 7) / 8);
    // per-check parity bits: small internal area (hosted target)
    thread_local std::vector<uint8_t> parity_bits;
    parity_bits.assign((Cn + 7) / 8, 0);
    uint8_t *par = parity_bits.data();

    const int32_t *ec = t.edge_check.data();
    const int32_t *ev = t.edge_var.data();

    for (size_t it = 0; it < max_iters; ++it) {
        for (int i = 0; i < n; ++i) va[i] = llrs[i];
        for (int i = n; i < Vn; ++i) va[i] = T(0);  // punctured (decoder.rs:382-383)
        // sweep 1: u from (min1|min2, signs); accumulate marginals
        for (int e = 0; e < E; ++e) {
            const int c = ec[e], x = ev[e];
            T mag = (O::abs(v[e]) == min1[c]) ? min2[c] : min1[c];
            bool neg = (get_bit(sgns, c) != 0) != O::hard(v[e]);
            u[e] = neg ? static_cast<T>(-mag) : mag;
            va[x] = O::add(va[x], u[e]);
        }
        // sweep 2: self-corrected v; new min1/min2/signs; parity of va
        for (int c = 0; c < Cn; ++c) {
            min1[c] = O::maxval();
            min2[c] = O::maxval();
        }
        std::memset(sgns, 0, (Cn + 7) / 8);
        std::memset(par, 0, (Cn + 7) / 8);
        for (int e = 0; e < E; ++e) {
            const int c = ec[e], x = ev[e];
            const T new_v = O::sub(va[x], u[e]);
            v[e] = (O::hard(new_v) == O::hard(v[e]) || v[e] == T(0)) ? new_v : T(0);
            const T av = O::abs(v[e]);
            if (av < min1[c]) {
                min2[c] = min1[c];
                min1[c] = av;
            } else if (av < min2[c]) {
                min2[c] = av;
            }
            if (O::hard(v[e])) set_bit(sgns, c, !get_bit(sgns, c));
            if (O::hard(va[x])) set_bit(par, c, !get_bit(par, c));
        }
        bool all_ok = true;
        for (int i = 0; i < (Cn + 7) / 8 && all_ok; ++i) all_ok = par[i] == 0;
        if (all_ok) {
            for (int i = 0; i < Vn; ++i) set_bit(output, i, O::hard(va[i]));
            if (iters_run) *iters_run = it;
            return true;
        }
    }
    for (int i = 0; i < Vn; ++i) set_bit(output, i, O::hard(va[i]));
    if (iters_run) *iters_run = max_iters;
    return false;
}

// ---- erasure repair (src/decoder.rs:144-223) ------------------------------

bool decode_erasures_impl(int code, uint8_t *bits, size_t max_iters, size_t *iters_run) {
    // bits: n+p unpacked hard bits (bytes 0/1); punctured tail pre-zeroed.
    const CodeParams &p = CODE_PARAMS[code];
    const CodeTables &t = tables(code);
    const int n = p.n, pb = p.punctured_bits;
    const int Vn = n + pb, Cn = Vn - p.k, E = p.paritycheck_sum;
    std::vector<uint8_t> erased(Vn, 0);
    for (int i = n; i < Vn; ++i) erased[i] = 1;
    std::vector<uint8_t> parity(Cn);
    std::vector<int32_t> ecount(Cn), votes(Vn);

    size_t bits_fixed = 0;  // accumulates ACROSS iterations (reference quirk,
                            // decoder.rs:205-218: reaches p at iteration 0)
    for (size_t it = 0; it < max_iters; ++it) {
        std::fill(parity.begin(), parity.end(), 0);
        std::fill(ecount.begin(), ecount.end(), 0);
        std::fill(votes.begin(), votes.end(), 0);
        for (int e = 0; e < E; ++e) {
            const int c = t.edge_check[e], x = t.edge_var[e];
            if (erased[x])
                ecount[c] = std::min(ecount[c] + 1, 2);
            else if (bits[x])
                parity[c] ^= 1;
        }
        for (int e = 0; e < E; ++e) {
            const int c = t.edge_check[e], x = t.edge_var[e];
            if (erased[x] && ecount[c] == 1) votes[x] += parity[c] ? 1 : -1;
        }
        for (int x = n; x < Vn; ++x) {
            if (!erased[x]) continue;
            if (votes[x] > 0) {
                bits[x] = 1;
                erased[x] = 0;
            }
            ++bits_fixed;
        }
        if (bits_fixed == static_cast<size_t>(pb)) {
            if (iters_run) *iters_run = it;
            return true;
        }
    }
    if (iters_run) *iters_run = max_iters;
    return false;
}

}  // namespace

extern "C" {

size_t labrador_ldpc_code_n(enum labrador_ldpc_code code) { return CODE_PARAMS[code].n; }
size_t labrador_ldpc_code_k(enum labrador_ldpc_code code) { return CODE_PARAMS[code].k; }
size_t labrador_ldpc_punctured_bits(enum labrador_ldpc_code code) {
    return CODE_PARAMS[code].punctured_bits;
}
size_t labrador_ldpc_paritycheck_sum(enum labrador_ldpc_code code) {
    return CODE_PARAMS[code].paritycheck_sum;
}
size_t labrador_ldpc_bf_working_len(enum labrador_ldpc_code code) {
    const CodeParams &p = CODE_PARAMS[code];
    return p.n + p.punctured_bits;
}
size_t labrador_ldpc_ms_working_len(enum labrador_ldpc_code code) {
    const CodeParams &p = CODE_PARAMS[code];
    return 2 * p.paritycheck_sum + 3 * p.n + 3 * p.punctured_bits - 2 * p.k;
}
size_t labrador_ldpc_ms_working_u8_len(enum labrador_ldpc_code code) {
    const CodeParams &p = CODE_PARAMS[code];
    return (p.n + p.punctured_bits - p.k) / 8;
}
size_t labrador_ldpc_output_len(enum labrador_ldpc_code code) {
    const CodeParams &p = CODE_PARAMS[code];
    return (p.n + p.punctured_bits) / 8;
}

void labrador_ldpc_encode(enum labrador_ldpc_code code, uint8_t *codeword) {
    const CodeParams &p = CODE_PARAMS[code];
    const CodeTables &t = tables(code);
    const int k = p.k, r = p.n - p.k, row_u64 = r / 64;
    uint64_t parity[128];  // max r/64 = 64 (TM8192); headroom
    std::memset(parity, 0, sizeof(uint64_t) * row_u64);
    for (int i = 0; i < k; ++i) {
        if (!get_bit(codeword, i)) continue;
        const uint64_t *row = &t.g_parity[static_cast<size_t>(i) * row_u64];
        for (int w = 0; w < row_u64; ++w) parity[w] ^= row[w];
    }
    uint8_t *out = codeword + k / 8;
    for (int byte = 0; byte < r / 8; ++byte)
        out[byte] = static_cast<uint8_t>(parity[byte / 8] >> (56 - 8 * (byte % 8)));
}

void labrador_ldpc_copy_encode(enum labrador_ldpc_code code, const uint8_t *data,
                               uint8_t *codeword) {
    std::memcpy(codeword, data, CODE_PARAMS[code].k / 8);
    labrador_ldpc_encode(code, codeword);
}

bool labrador_ldpc_decode_bf(enum labrador_ldpc_code code, const uint8_t *input,
                             uint8_t *output, uint8_t *working, size_t max_iters,
                             size_t *iters_run) {
    const CodeParams &p = CODE_PARAMS[code];
    const CodeTables &t = tables(code);
    const int n = p.n, Vn = p.n + p.punctured_bits, Cn = Vn - p.k;
    const int E = p.paritycheck_sum;
    // working: Vn bytes of unpacked bits (the reference packs state into the
    // same area differently, decoder.rs:261-262; behavior is what's pinned)
    uint8_t *bits = working;
    for (int i = 0; i < n; ++i) bits[i] = static_cast<uint8_t>(get_bit(input, i));
    for (int i = n; i < Vn; ++i) bits[i] = 0;

    size_t erasure_iters = 0;
    if (p.punctured_bits > 0) decode_erasures_impl(code, bits, max_iters, &erasure_iters);

    thread_local std::vector<uint8_t> parity;
    thread_local std::vector<int32_t> violations;
    parity.assign(Cn, 0);
    violations.assign(Vn, 0);
    for (size_t it = 0; it < max_iters; ++it) {
        std::fill(parity.begin(), parity.end(), 0);
        std::fill(violations.begin(), violations.end(), 0);
        for (int e = 0; e < E; ++e) parity[t.edge_check[e]] ^= bits[t.edge_var[e]];
        for (int e = 0; e < E; ++e)
            if (parity[t.edge_check[e]]) ++violations[t.edge_var[e]];
        const int32_t mx = *std::max_element(violations.begin(), violations.end());
        if (mx == 0) {
            for (int i = 0; i < Vn; ++i) set_bit(output, i, bits[i]);
            if (iters_run) *iters_run = it + erasure_iters;
            return true;
        }
        for (int i = 0; i < Vn; ++i)
            if (violations[i] == mx) bits[i] ^= 1;  // flip ALL at max (decoder.rs:292-296)
    }
    for (int i = 0; i < Vn; ++i) set_bit(output, i, bits[i]);
    if (iters_run) *iters_run = max_iters + erasure_iters;
    return false;
}

#define DEFINE_MS(SUFFIX, T)                                                              \
    bool labrador_ldpc_decode_ms_##SUFFIX(enum labrador_ldpc_code code, const T *llrs,    \
                                          uint8_t *output, T *working,                    \
                                          uint8_t *working_u8, size_t max_iters,          \
                                          size_t *iters_run) {                            \
        return decode_ms_impl<T>(code, llrs, output, working, working_u8, max_iters,      \
                                 iters_run);                                              \
    }
DEFINE_MS(i8, int8_t)
DEFINE_MS(i16, int16_t)
DEFINE_MS(f32, float)
DEFINE_MS(f64, double)
#undef DEFINE_MS

#define DEFINE_CONVERTERS(SUFFIX, T)                                                      \
    void labrador_ldpc_hard_to_llrs_##SUFFIX(enum labrador_ldpc_code code,                \
                                             const uint8_t *input, T *llrs) {             \
        const int n = CODE_PARAMS[code].n;                                                \
        for (int i = 0; i < n; ++i) llrs[i] = get_bit(input, i) ? T(-1) : T(1);           \
    }                                                                                     \
    void labrador_ldpc_llrs_to_hard_##SUFFIX(enum labrador_ldpc_code code, const T *llrs, \
                                             uint8_t *output) {                           \
        const int n = CODE_PARAMS[code].n;                                                \
        for (int i = 0; i < n; ++i) set_bit(output, i, llrs[i] < 0);                      \
    }
DEFINE_CONVERTERS(i8, int8_t)
DEFINE_CONVERTERS(i16, int16_t)
DEFINE_CONVERTERS(f32, float)
DEFINE_CONVERTERS(f64, double)
#undef DEFINE_CONVERTERS

}  // extern "C"
