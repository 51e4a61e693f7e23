// GF(256) Cauchy Reed-Solomon erasure codec — the CM256 role, native.
//
// The reference protects SDRdaemon UDP superframes with the external
// cm256cc library (Cauchy RS over GF(256), SSSE3 region math); this is a
// from-scratch equivalent exposed over a C ABI for ctypes
// (sdrangel_tpu/io/fec.py). Same field as the NumPy fallback there:
// primitive polynomial 0x11D, Cauchy matrix C[i,j] = 1/(x_j ^ y_i) with
// x = 0..k-1 (data ids), y = k..k+rows-1 (parity ids).
//
// Region multiply uses the standard 4-bit split-table scheme: for a
// coefficient c, bytes split into nibbles and two 16-entry tables give
// c*lo and c*(hi<<4); with SSSE3 the tables live in registers and
// _mm_shuffle_epi8 does 16 lookups per instruction.

#include <cstdint>
#include <cstring>

#if defined(__SSSE3__)
#include <tmmintrin.h>
#endif

namespace {

constexpr int kPrimPoly = 0x11D;

struct Tables {
    uint8_t exp[512];
    uint8_t log[256];
    Tables() {
        int x = 1;
        for (int i = 0; i < 255; i++) {
            exp[i] = static_cast<uint8_t>(x);
            log[x] = static_cast<uint8_t>(i);
            x <<= 1;
            if (x & 0x100) x ^= kPrimPoly;
        }
        for (int i = 255; i < 510; i++) exp[i] = exp[i - 255];
        exp[510] = exp[511] = 0;
        log[0] = 0;
    }
};

const Tables T;

inline uint8_t gf_mul(uint8_t a, uint8_t b) {
    if (!a || !b) return 0;
    return T.exp[T.log[a] + T.log[b]];
}

inline uint8_t gf_inv(uint8_t a) { return T.exp[255 - T.log[a]]; }

// dst ^= c * src over n bytes
void addmul(uint8_t* dst, const uint8_t* src, uint8_t c, size_t n) {
    if (c == 0) return;
    if (c == 1) {
        for (size_t i = 0; i < n; i++) dst[i] ^= src[i];
        return;
    }
    uint8_t lo[16], hi[16];
    for (int i = 0; i < 16; i++) {
        lo[i] = gf_mul(c, static_cast<uint8_t>(i));
        hi[i] = gf_mul(c, static_cast<uint8_t>(i << 4));
    }
    size_t i = 0;
#if defined(__SSSE3__)
    const __m128i tlo = _mm_loadu_si128(reinterpret_cast<const __m128i*>(lo));
    const __m128i thi = _mm_loadu_si128(reinterpret_cast<const __m128i*>(hi));
    const __m128i mask = _mm_set1_epi8(0x0F);
    for (; i + 16 <= n; i += 16) {
        __m128i v = _mm_loadu_si128(reinterpret_cast<const __m128i*>(src + i));
        __m128i d = _mm_loadu_si128(reinterpret_cast<__m128i*>(dst + i));
        __m128i l = _mm_and_si128(v, mask);
        __m128i h = _mm_and_si128(_mm_srli_epi64(v, 4), mask);
        __m128i r = _mm_xor_si128(_mm_shuffle_epi8(tlo, l),
                                  _mm_shuffle_epi8(thi, h));
        _mm_storeu_si128(reinterpret_cast<__m128i*>(dst + i),
                         _mm_xor_si128(d, r));
    }
#endif
    for (; i < n; i++) dst[i] ^= lo[src[i] & 0x0F] ^ hi[src[i] >> 4];
}

inline uint8_t cauchy(int parity_row, int data_col, int k) {
    return gf_inv(static_cast<uint8_t>(data_col ^ (k + parity_row)));
}

}  // namespace

extern "C" {

// parity (n_fec x L) = Cauchy(n_fec x k) * data (k x L)
void fec_encode(const uint8_t* data, int32_t k, int32_t L, int32_t n_fec,
                uint8_t* parity) {
    std::memset(parity, 0, static_cast<size_t>(n_fec) * L);
    for (int r = 0; r < n_fec; r++)
        for (int j = 0; j < k; j++)
            addmul(parity + static_cast<size_t>(r) * L,
                   data + static_cast<size_t>(j) * L, cauchy(r, j, k), L);
}

// data: (k x L), rows flagged in `missing` (k bytes, 1 = absent) are
// reconstructed in place from `m` parity blocks (m x L) whose original
// parity-row indices are in `parity_rows`. Returns 0 on success, -1 if
// m < #missing or the system is singular (cannot happen for a true
// Cauchy submatrix, kept as a guard).
int32_t fec_decode(uint8_t* data, const uint8_t* missing, int32_t k,
                   int32_t L, const uint8_t* parity,
                   const int32_t* parity_rows, int32_t m) {
    int miss_idx[256];
    int n_miss = 0;
    for (int j = 0; j < k; j++)
        if (missing[j]) miss_idx[n_miss++] = j;
    if (n_miss == 0) return 0;
    if (m < n_miss) return -1;

    // rhs_r = parity_r ^ sum_{known j} C[r,j] d_j   (one row per used parity)
    // sub[r][c] = C[r, missing_c]
    uint8_t* rhs = new uint8_t[static_cast<size_t>(n_miss) * L];
    uint8_t sub[256][256];
    for (int ri = 0; ri < n_miss; ri++) {
        const int r = parity_rows[ri];
        std::memcpy(rhs + static_cast<size_t>(ri) * L,
                    parity + static_cast<size_t>(ri) * L, L);
        for (int j = 0; j < k; j++)
            if (!missing[j])
                addmul(rhs + static_cast<size_t>(ri) * L,
                       data + static_cast<size_t>(j) * L, cauchy(r, j, k), L);
        for (int c = 0; c < n_miss; c++) sub[ri][c] = cauchy(r, miss_idx[c], k);
    }

    // Gaussian elimination over GF(256) on [sub | rhs]
    for (int col = 0; col < n_miss; col++) {
        int piv = -1;
        for (int row = col; row < n_miss; row++)
            if (sub[row][col]) { piv = row; break; }
        if (piv < 0) { delete[] rhs; return -1; }
        if (piv != col) {
            for (int c = 0; c < n_miss; c++) {
                uint8_t t = sub[col][c]; sub[col][c] = sub[piv][c]; sub[piv][c] = t;
            }
            for (int b = 0; b < L; b++) {
                uint8_t t = rhs[static_cast<size_t>(col) * L + b];
                rhs[static_cast<size_t>(col) * L + b] =
                    rhs[static_cast<size_t>(piv) * L + b];
                rhs[static_cast<size_t>(piv) * L + b] = t;
            }
        }
        const uint8_t inv = gf_inv(sub[col][col]);
        for (int c = 0; c < n_miss; c++) sub[col][c] = gf_mul(sub[col][c], inv);
        // scale rhs row: rhs_col = inv * rhs_col (addmul into zeroed tmp)
        if (inv != 1) {
            uint8_t* row = rhs + static_cast<size_t>(col) * L;
            uint8_t lo[16], hi[16];
            for (int i = 0; i < 16; i++) {
                lo[i] = gf_mul(inv, static_cast<uint8_t>(i));
                hi[i] = gf_mul(inv, static_cast<uint8_t>(i << 4));
            }
            for (int b = 0; b < L; b++) row[b] = lo[row[b] & 0x0F] ^ hi[row[b] >> 4];
        }
        for (int row = 0; row < n_miss; row++) {
            if (row == col || !sub[row][col]) continue;
            const uint8_t c = sub[row][col];
            for (int cc = 0; cc < n_miss; cc++)
                sub[row][cc] ^= gf_mul(c, sub[col][cc]);
            addmul(rhs + static_cast<size_t>(row) * L,
                   rhs + static_cast<size_t>(col) * L, c, L);
        }
    }

    for (int mi = 0; mi < n_miss; mi++)
        std::memcpy(data + static_cast<size_t>(miss_idx[mi]) * L,
                    rhs + static_cast<size_t>(mi) * L, L);
    delete[] rhs;
    return 0;
}

}  // extern "C"
