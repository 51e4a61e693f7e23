// Shared helpers between the golden-generator translation units.
// (decimators.h and decimatorsu.h both define decimation_shifts<> and so
// cannot be included in one TU; ref_golden_gen_u.cc holds the unsigned
// group.)
#ifndef REF_GOLDEN_COMMON_H
#define REF_GOLDEN_COMMON_H

#include <cstdint>
#include <string>
#include <vector>

void save_i16_g(const std::string& name, const std::vector<int16_t>& v,
                const std::string& params);
void save_f32_g(const std::string& name, const std::vector<float>& v,
                const std::string& params);

// splitmix64, see ref_golden_gen.cc
struct GoldenRng {
  uint64_t s;
  explicit GoldenRng(uint64_t seed) : s(seed) {}
  uint64_t next() {
    uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  double uniform() { return (double)(int64_t)next() / 9.223372036854776e18; }
};

void gen_decimators_u();  // in ref_golden_gen_u.cc
void gen_tx_goldens();    // in ref_golden_gen_tx.cc

#endif
