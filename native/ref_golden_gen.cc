// Golden-vector generator built from the ACTUAL reference DSP sources.
//
// Unlike native/ref_cpu_bench.cc (a transcription used only for the CPU
// baseline number), this program #includes the reference's own headers from
// /root/reference/sdrbase behind a 25-line QtGlobal typedef shim
// (native/qtshim/QtGlobal) and links its Qt-free .cpp files, so every byte
// it emits was produced by reference code, not by a re-implementation:
//
//   decimators.h           Decimators<qint32,qint16,16,12> ÷1..÷64 cen/inf/sup
//   decimatorsif/fi/ff.h   float-path decimators
//   decimatorsu.h          unsigned (u8-style) input decimators
//   inthalfbandfiltereo.h  DownChannelizer-style order-48 stage chains
//   nco.cpp                phase-wheel LUT sequences
//   fftfilt.cpp            OLA SSB/DSB/Asym filter blocks
//   interpolator.cpp       polyphase decimating resampler
//   phasediscri.h + nfm feed composition (nfmdemod.cpp:140-330) end to end
//
// Outputs: raw little-endian arrays + manifest.json in the directory given
// as argv[1]. tools/gen_reference_goldens.py builds and runs this; the
// pinned outputs live in tests/goldens/ and are asserted against the JAX
// paths by tests/test_reference_golden.py.
//
// Build (see tools/gen_reference_goldens.py):
//   g++ -O2 -std=c++14 -Dsdrangel_STATIC \
//       -I native/qtshim -I /root/reference/sdrbase -I /root/reference/exports \
//       native/ref_golden_gen.cc \
//       /root/reference/sdrbase/dsp/nco.cpp \
//       /root/reference/sdrbase/dsp/interpolator.cpp \
//       /root/reference/sdrbase/dsp/fftfilt.cpp \
//       /root/reference/sdrbase/dsp/hbfiltertraits.cpp \
//       /root/reference/sdrbase/dsp/ctcssdetector.cpp \
//       /root/reference/sdrbase/dsp/afsquelch.cpp -o ref_golden_gen

#include <QtGlobal>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "dsp/dsptypes.h"
#include "dsp/decimators.h"
#include "dsp/decimatorsif.h"
#include "dsp/decimatorsfi.h"
#include "dsp/decimatorsff.h"
#include "dsp/inthalfbandfiltereo.h"
#include "dsp/nco.h"
#include "dsp/fftfilt.h"
#include "dsp/interpolator.h"
#include "dsp/phasediscri.h"
#include "dsp/bandpass.h"
#include "dsp/lowpass.h"
#include "dsp/afsquelch.h"
#include "dsp/ctcssdetector.h"
#include "dsp/agc.h"
#include "util/movingaverage.h"
#include "util/doublebufferfifo.h"
#include "util/stepfunctions.h"
#include "util/db.h"
#include "dsp/phaselock.h"
#include "dsp/phaselockcomplex.h"
#include "dsp/filterrc.h"

#include "ref_golden_common.h"

namespace {

std::string g_dir;
std::vector<std::string> g_manifest;

void write_bytes(const std::string& name, const void* p, size_t bytes) {
  std::string path = g_dir + "/" + name;
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(1); }
  fwrite(p, 1, bytes, f);
  fclose(f);
}

void manifest_add(const std::string& name, const char* dtype, size_t count,
                  const std::string& params_json) {
  char buf[512];
  snprintf(buf, sizeof(buf),
           "  \"%s\": {\"dtype\": \"%s\", \"count\": %zu, \"params\": %s}",
           name.c_str(), dtype, count, params_json.c_str());
  g_manifest.push_back(buf);
}

void save_i16(const std::string& name, const std::vector<qint16>& v,
              const std::string& params) {
  write_bytes(name + ".i16", v.data(), v.size() * sizeof(qint16));
  manifest_add(name, "int16", v.size(), params);
}

void save_f32(const std::string& name, const std::vector<float>& v,
              const std::string& params) {
  write_bytes(name + ".f32", v.data(), v.size() * sizeof(float));
  manifest_add(name, "float32", v.size(), params);
}

}  // namespace

// Cross-TU writers for ref_golden_gen_u.cc.
void save_i16_g(const std::string& name, const std::vector<int16_t>& v,
                const std::string& params) {
  save_i16(name, v, params);
}
void save_f32_g(const std::string& name, const std::vector<float>& v,
                const std::string& params) {
  save_f32(name, v, params);
}

namespace {

// Deterministic PRNG (splitmix64) — inputs are saved to disk so consumers
// never have to reproduce this.
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed) {}
  uint64_t next() {
    uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // uniform in [-1, 1)
  double uniform() { return (double)(int64_t)next() / 9.223372036854776e18; }
};

// int16 interleaved I/Q: noise + two complex tones at the given frequency
// fractions, amplitude bounded for the given input bit width.
std::vector<qint16> make_iq_int_tones(int n_complex, int input_bits,
                                      double f1, double f2, double noise_amp,
                                      uint64_t seed) {
  Rng rng(seed);
  double full = (double)((1 << (input_bits - 1)) - 1);
  std::vector<qint16> v(2 * n_complex);
  for (int n = 0; n < n_complex; ++n) {
    double ph1 = 2.0 * M_PI * f1 * n;
    double ph2 = 2.0 * M_PI * f2 * n;
    double i = 0.35 * cos(ph1) + 0.2 * cos(ph2) + noise_amp * rng.uniform();
    double q = 0.35 * sin(ph1) + 0.2 * sin(ph2) + noise_amp * rng.uniform();
    v[2 * n] = (qint16)lrint(i * full);
    v[2 * n + 1] = (qint16)lrint(q * full);
  }
  return v;
}

std::vector<qint16> make_iq_int(int n_complex, int input_bits, uint64_t seed) {
  return make_iq_int_tones(n_complex, input_bits, 0.0137, 0.0031, 0.25, seed);
}

// Wanted-band centre of a decimateN_{cen,inf,sup} cascade as a fraction of
// the input rate (devicesamplesource.cpp:84-110 calculateFrequencyShift).
double wanted_band_center(int log2, const char* pos) {
  if (pos[0] == 'c' || log2 == 0) return 0.0;
  double sign = (pos[0] == 'i') ? -1.0 : 1.0;
  return (log2 < 3) ? sign / (double)(2 << log2) : sign / (double)(1 << log2);
}

std::vector<float> make_iq_float(int n_complex, double amp, uint64_t seed) {
  Rng rng(seed);
  std::vector<float> v(2 * n_complex);
  for (int n = 0; n < n_complex; ++n) {
    double ph1 = 2.0 * M_PI * 0.0137 * n;
    double ph2 = 2.0 * M_PI * 0.0031 * n;
    v[2 * n] = (float)(amp * (0.35 * cos(ph1) + 0.2 * cos(ph2) + 0.25 * rng.uniform()));
    v[2 * n + 1] = (float)(amp * (0.35 * sin(ph1) + 0.2 * sin(ph2) + 0.25 * rng.uniform()));
  }
  return v;
}

// ---------------------------------------------------------------------------
// Group A: integer decimators, the sdrangelbench workload
// (Decimators<qint32,qint16,SdrBits=16,InputBits=12>, mainbench.cpp:69-110).
// ---------------------------------------------------------------------------

typedef Decimators<qint32, qint16, 16, 12> DecII12;

template <typename D, typename Method>
std::vector<qint16> run_decim_ii(const std::vector<qint16>& in, Method m) {
  D dec;
  SampleVector out(in.size());
  SampleVector::iterator it = out.begin();
  (dec.*m)(&it, in.data(), (qint32)in.size());
  size_t n = (size_t)(it - out.begin());
  std::vector<qint16> flat(2 * n);
  for (size_t k = 0; k < n; ++k) {
    flat[2 * k] = out[k].real();
    flat[2 * k + 1] = out[k].imag();
  }
  return flat;
}

void gen_decimators_ii() {
  const int N = 32768;
  typedef void (DecII12::*M)(SampleVector::iterator*, const qint16*, qint32);
  struct Case { const char* name; M m; int log2; const char* pos; };
  const Case cases[] = {
      {"decii_cen_l0", &DecII12::decimate1, 0, "cen"},
      {"decii_cen_l1", &DecII12::decimate2_cen, 1, "cen"},
      {"decii_inf_l1", &DecII12::decimate2_inf, 1, "inf"},
      {"decii_sup_l1", &DecII12::decimate2_sup, 1, "sup"},
      {"decii_cen_l2", &DecII12::decimate4_cen, 2, "cen"},
      {"decii_inf_l2", &DecII12::decimate4_inf, 2, "inf"},
      {"decii_sup_l2", &DecII12::decimate4_sup, 2, "sup"},
      {"decii_cen_l3", &DecII12::decimate8_cen, 3, "cen"},
      {"decii_inf_l3", &DecII12::decimate8_inf, 3, "inf"},
      {"decii_sup_l3", &DecII12::decimate8_sup, 3, "sup"},
      {"decii_cen_l4", &DecII12::decimate16_cen, 4, "cen"},
      {"decii_inf_l4", &DecII12::decimate16_inf, 4, "inf"},
      {"decii_sup_l4", &DecII12::decimate16_sup, 4, "sup"},
      {"decii_cen_l5", &DecII12::decimate32_cen, 5, "cen"},
      {"decii_inf_l5", &DecII12::decimate32_inf, 5, "inf"},
      {"decii_sup_l5", &DecII12::decimate32_sup, 5, "sup"},
      {"decii_cen_l6", &DecII12::decimate64_cen, 6, "cen"},
      {"decii_inf_l6", &DecII12::decimate64_inf, 6, "inf"},
      {"decii_sup_l6", &DecII12::decimate64_sup, 6, "sup"},
  };
  // Per-case inputs: tones INSIDE the case's wanted band (so the golden pins
  // in-band parity, not transition-band don't-care response) + light
  // broadband noise to exercise stopband rejection.
  uint64_t seed = 0x5eed0100ULL;
  for (const Case& c : cases) {
    double fc = wanted_band_center(c.log2, c.pos);
    double half_bw = 0.5 / (double)(1 << c.log2);
    double f1 = fc + 0.30 * half_bw;
    double f2 = fc - 0.22 * half_bw;
    std::vector<qint16> in = make_iq_int_tones(N, 12, f1, f2, 0.06, seed++);
    char params[192];
    snprintf(params, sizeof(params),
             "{\"log2\": %d, \"fc_pos\": \"%s\", \"f1\": %.8f, \"f2\": %.8f, "
             "\"noise\": 0.06, \"input_bits\": 12}",
             c.log2, c.pos, f1, f2);
    save_i16(std::string(c.name) + "_input", in, params);
    std::vector<qint16> out = run_decim_ii<DecII12>(in, c.m);
    snprintf(params, sizeof(params),
             "{\"log2\": %d, \"fc_pos\": \"%s\", \"sdr_bits\": 16, \"input_bits\": 12}",
             c.log2, c.pos);
    save_i16(c.name, out, params);
  }
}

// Float-path decimators: IF (int in, float out), FI, FF.
void gen_decimators_float() {
  const int N = 16384;
  std::vector<qint16> in_i = make_iq_int(N, 12, 0x5eed0003ULL);
  save_i16("decif_input", in_i, "{\"n_complex\": 16384, \"input_bits\": 12}");
  {
    DecimatorsIF<qint16, 12> dec;
    FSampleVector out(N);
    FSampleVector::iterator it = out.begin();
    dec.decimate16_cen(&it, in_i.data(), (qint32)in_i.size());
    size_t n = (size_t)(it - out.begin());
    std::vector<float> flat(2 * n);
    for (size_t k = 0; k < n; ++k) {
      flat[2 * k] = out[k].real();
      flat[2 * k + 1] = out[k].imag();
    }
    save_f32("decif_cen_l4", flat, "{\"log2\": 4, \"fc_pos\": \"cen\", \"input_bits\": 12}");
  }
  std::vector<float> in_f = make_iq_float(N, 0.7, 0x5eed0004ULL);
  save_f32("decff_input", in_f, "{\"n_complex\": 16384}");
  {
    DecimatorsFF dec;
    FSampleVector out(N);
    FSampleVector::iterator it = out.begin();
    dec.decimate16_cen(&it, in_f.data(), (qint32)in_f.size());
    size_t n = (size_t)(it - out.begin());
    std::vector<float> flat(2 * n);
    for (size_t k = 0; k < n; ++k) {
      flat[2 * k] = out[k].real();
      flat[2 * k + 1] = out[k].imag();
    }
    save_f32("decff_cen_l4", flat, "{\"log2\": 4, \"fc_pos\": \"cen\"}");
  }
  {
    DecimatorsFI dec;
    SampleVector out(N);
    SampleVector::iterator it = out.begin();
    dec.decimate16_cen(&it, in_f.data(), (qint32)in_f.size());
    size_t n = (size_t)(it - out.begin());
    std::vector<qint16> flat(2 * n);
    for (size_t k = 0; k < n; ++k) {
      flat[2 * k] = out[k].real();
      flat[2 * k + 1] = out[k].imag();
    }
    save_i16("decfi_cen_l4", flat, "{\"log2\": 4, \"fc_pos\": \"cen\"}");
  }
}

// ---------------------------------------------------------------------------
// Group B: NCO LUT sequences (nco.cpp:40-77).
// ---------------------------------------------------------------------------

void gen_nco() {
  struct Case { const char* name; double freq; double rate; };
  const Case cases[] = {
      {"nco_m12000_48k", -12000.0, 48000.0},
      {"nco_1234p5_48k", 1234.5, 48000.0},
      {"nco_100k_768k", 100000.0, 768000.0},
  };
  for (const Case& c : cases) {
    NCO nco;
    nco.setFreq((Real)c.freq, (Real)c.rate);
    const int N = 8192;
    std::vector<float> v(2 * N);
    for (int n = 0; n < N; ++n) {
      Complex z = nco.nextIQ();
      v[2 * n] = z.real();
      v[2 * n + 1] = z.imag();
    }
    char params[96];
    snprintf(params, sizeof(params), "{\"freq\": %.1f, \"rate\": %.1f}", c.freq, c.rate);
    save_f32(c.name, v, params);
  }
}

// ---------------------------------------------------------------------------
// Group C: fftfilt OLA blocks (fftfilt.cpp:261-396) — SSB/DSB/Asym.
// ---------------------------------------------------------------------------

void gen_fftfilt() {
  const int N = 16384;
  const int LEN = 1024;  // ssbFftLen, ssbdemod.cpp
  std::vector<float> in = make_iq_float(N, 0.4, 0x5eed0010ULL);
  save_f32("fftfilt_input", in, "{\"n_complex\": 16384}");

  struct Sink {
    std::vector<float> buf;
    void push(const fftfilt::cmplx* out, int n) {
      for (int k = 0; k < n; ++k) {
        buf.push_back(out[k].real());
        buf.push_back(out[k].imag());
      }
    }
  };

  const float f1 = 300.0f / 48000.0f, f2 = 3000.0f / 48000.0f;
  {
    fftfilt filt(f1, f2, LEN);
    Sink sk;
    fftfilt::cmplx* out;
    for (int n = 0; n < N; ++n) {
      int c = filt.runSSB(fftfilt::cmplx(in[2 * n], in[2 * n + 1]), &out, true);
      sk.push(out, c);
    }
    save_f32("fftfilt_ssb_usb", sk.buf,
             "{\"f1\": 0.00625, \"f2\": 0.0625, \"len\": 1024, \"usb\": true}");
  }
  {
    fftfilt filt(f1, f2, LEN);
    Sink sk;
    fftfilt::cmplx* out;
    for (int n = 0; n < N; ++n) {
      int c = filt.runSSB(fftfilt::cmplx(in[2 * n], in[2 * n + 1]), &out, false);
      sk.push(out, c);
    }
    save_f32("fftfilt_ssb_lsb", sk.buf,
             "{\"f1\": 0.00625, \"f2\": 0.0625, \"len\": 1024, \"usb\": false}");
  }
  {
    fftfilt filt(f2, LEN);  // (f2,len) ctor -> create_dsb_filter
    Sink sk;
    fftfilt::cmplx* out;
    for (int n = 0; n < N; ++n) {
      int c = filt.runDSB(fftfilt::cmplx(in[2 * n], in[2 * n + 1]), &out);
      sk.push(out, c);
    }
    save_f32("fftfilt_dsb", sk.buf, "{\"f2\": 0.0625, \"len\": 1024}");
  }
  {
    // Vestigial: in-band 3 kHz, opposite band 500 Hz (ATV vestigial path).
    fftfilt filt(f1, f2, LEN);
    filt.create_asym_filter(500.0f / 48000.0f, 3000.0f / 48000.0f);
    Sink sk;
    fftfilt::cmplx* out;
    for (int n = 0; n < N; ++n) {
      int c = filt.runAsym(fftfilt::cmplx(in[2 * n], in[2 * n + 1]), &out, true);
      sk.push(out, c);
    }
    save_f32("fftfilt_asym_usb", sk.buf,
             "{\"fopp\": 0.010416667, \"fin\": 0.0625, \"len\": 1024, \"usb\": true}");
  }
}

// ---------------------------------------------------------------------------
// Group D: Interpolator (polyphase resampler, interpolator.h:23-52).
// ---------------------------------------------------------------------------

void gen_interpolator() {
  const int N = 16384;
  std::vector<float> in = make_iq_float(N, 0.5 * 32768.0, 0x5eed0020ULL);
  save_f32("interp_input", in, "{\"n_complex\": 16384, \"amp\": 16384.0}");

  struct Case { const char* name; double in_rate; double cutoff; double out_rate; };
  const Case cases[] = {
      // 96 kHz -> 48 kHz, NFM-style cutoff rfBw/2.2
      {"interp_96k_48k", 96000.0, 12500.0 / 2.2, 48000.0},
      // non-integer ratio: 125 kHz -> 48 kHz
      {"interp_125k_48k", 125000.0, 12500.0 / 2.2, 48000.0},
  };
  for (const Case& c : cases) {
    Interpolator interp;
    interp.create(16, c.in_rate, c.cutoff);
    Real distance = (Real)(c.in_rate / c.out_rate);
    Real remain = 0;
    std::vector<float> outv;
    Complex ci;
    for (int n = 0; n < N; ++n) {
      Complex s(in[2 * n], in[2 * n + 1]);
      if (interp.decimate(&remain, s, &ci)) {
        outv.push_back(ci.real());
        outv.push_back(ci.imag());
        remain += distance;
      }
    }
    char params[160];
    snprintf(params, sizeof(params),
             "{\"in_rate\": %.1f, \"out_rate\": %.1f, \"cutoff\": %.6f, \"phase_steps\": 16}",
             c.in_rate, c.out_rate, c.cutoff);
    save_f32(c.name, outv, params);
  }

  // Tx direction: Interpolator::interpolate (interpolator.h:39-52), the
  // pull-model upsampler of every channeltx modulator (nfmmod.cpp pull:128)
  // with the modulators' configuration (48 phases, 3 taps/phase).
  struct UpCase { const char* name; double out_rate; double cutoff; };
  const UpCase upcases[] = {
      {"interp_48k_96k", 96000.0, 12500.0 / 2.2},   // NFM channel rate
      {"interp_48k_120k", 120000.0, 12500.0 / 2.2}, // non-integer 2.5x
  };
  for (const UpCase& c : upcases) {
    Interpolator interp;
    interp.create(48, 48000.0, c.cutoff, 3.0);
    Real distance = (Real)(48000.0 / c.out_rate);
    Real remain = 0;
    std::vector<float> outv;
    Complex ci;
    size_t pos = 0;
    const size_t n_out = (size_t)((N - 8) * c.out_rate / 48000.0);
    for (size_t k = 0; k < n_out; ++k) {
      Complex s(in[2 * pos], in[2 * pos + 1]);
      if (interp.interpolate(&remain, s, &ci)) {
        if (pos + 1 < (size_t)N) ++pos;
      }
      remain += distance;
      outv.push_back(ci.real());
      outv.push_back(ci.imag());
    }
    char params[160];
    snprintf(params, sizeof(params),
             "{\"in_rate\": 48000.0, \"out_rate\": %.1f, \"cutoff\": %.6f, "
             "\"phase_steps\": 48, \"taps_per_phase\": 3.0}",
             c.out_rate, c.cutoff);
    save_f32(c.name, outv, params);
  }
}

// ---------------------------------------------------------------------------
// Group E: DownChannelizer-style order-48 half-band stage chains
// (downchannelizer.cpp:65-90 work loop + /2^stages, stages per
// createFilterChain:240-287; inthalfbandfiltereo.h workDecimate*).
// ---------------------------------------------------------------------------

typedef IntHalfbandFilterEO<qint32, qint32, 48> ChanHB;

void gen_channelizer_chain(const char* name, const std::vector<int>& modes,
                           double f1, double f2) {
  // 12-bit amplitudes in the 16-bit Sample container: the EO stages have
  // gain 2 each (divided out only at the end, downchannelizer.cpp:80-81), so
  // full-scale input would wrap qint16 between stages — real flows feed the
  // channelizer from decimators with matching headroom. Tones are placed
  // inside the chain's wanted band.
  const int N = 32768;
  std::vector<qint16> in = make_iq_int_tones(N, 12, f1, f2, 0.06,
                                             0x5eed0030ULL + modes.size());
  {
    char params[160];
    snprintf(params, sizeof(params),
             "{\"n_complex\": 32768, \"input_bits\": 12, \"f1\": %.8f, "
             "\"f2\": %.8f, \"noise\": 0.06}", f1, f2);
    save_i16(std::string(name) + "_input", in, params);
  }
  std::vector<ChanHB*> filters;
  for (size_t i = 0; i < modes.size(); ++i) filters.push_back(new ChanHB());
  std::vector<qint16> outv;
  for (int n = 0; n < N; ++n) {
    Sample s(in[2 * n], in[2 * n + 1]);
    bool alive = true;
    for (size_t i = 0; i < modes.size(); ++i) {
      bool ok;
      switch (modes[i]) {
        case 0: ok = filters[i]->workDecimateCenter(&s); break;
        case 1: ok = filters[i]->workDecimateLowerHalf(&s); break;
        default: ok = filters[i]->workDecimateUpperHalf(&s); break;
      }
      if (!ok) { alive = false; break; }
    }
    if (alive) {
      s.m_real /= (1 << modes.size());
      s.m_imag /= (1 << modes.size());
      outv.push_back(s.m_real);
      outv.push_back(s.m_imag);
    }
  }
  for (ChanHB* f : filters) delete f;
  std::string params = "{\"modes\": [";
  for (size_t i = 0; i < modes.size(); ++i) {
    params += std::to_string(modes[i]);
    if (i + 1 < modes.size()) params += ", ";
  }
  params += "], \"order\": 48}";
  save_i16(name, outv, params);
}

void gen_channelizer() {
  // mode codes: 0 = center, 1 = lower half (+fs/4), 2 = upper half (-fs/4)
  // Wanted bands: [0,0]->[-.125,.125]; [1,2,0]->[-.1875,-.0625];
  // [2,1]->[.25,.5]/2=[0,.25] (per createFilterChain recursion).
  gen_channelizer_chain("chan_cen_cen", {0, 0}, 0.0137, -0.0231);
  gen_channelizer_chain("chan_low_up_cen", {1, 2, 0}, -0.105, -0.145);
  gen_channelizer_chain("chan_up_low", {2, 1}, 0.105, 0.145);
}

// ---------------------------------------------------------------------------
// Group F: full NFM demod chain — the exact feed() composition of
// nfmdemod.cpp:140-330 with the ctor/applySettings state of
// nfmdemod.cpp:50-98 + applyChannelSettings:453-480 + applySettings:478-560.
// ---------------------------------------------------------------------------

void gen_nfm_chain(const char* name, int input_rate, int offset_hz,
                   int fm_dev, double volume, uint64_t seed) {
  const int audio_rate = 48000;
  const double rf_bw = 12500.0, af_bw = 3000.0;
  const int squelch_gate_setting = 5;       // 10s-of-ms units
  const double squelch_cb = -300.0;         // centi-bels

  // FM-modulated 1 kHz tone at 0.5 FS + light noise, at input_rate.
  const int N = 65536;
  Rng rng(seed);
  std::vector<qint16> in(2 * N);
  double phase = 0.0;
  for (int n = 0; n < N; ++n) {
    double inst = 3000.0 * cos(2.0 * M_PI * 1000.0 * n / input_rate) + offset_hz;
    phase += 2.0 * M_PI * inst / input_rate;
    double i = 0.5 * cos(phase) + 0.002 * rng.uniform();
    double q = 0.5 * sin(phase) + 0.002 * rng.uniform();
    in[2 * n] = (qint16)lrint(i * 32767.0);
    in[2 * n + 1] = (qint16)lrint(q * 32767.0);
  }
  save_i16(std::string(name) + "_input", in,
           "{\"n_complex\": 65536, \"mod_tone\": 1000.0, \"deviation\": 3000.0}");

  // --- state per NFMDemod ctor + applyChannelSettings + applySettings ---
  NCO nco;
  nco.setFreq((Real)(-offset_hz), (Real)input_rate);
  Interpolator interpolator;
  interpolator.create(16, input_rate, rf_bw / 2.2);
  Real interp_distance = (Real)input_rate / (Real)audio_rate;
  Real interp_remain = 0;
  Bandpass<Real> bandpass;
  bandpass.create(301, audio_rate, 300.0, af_bw);
  int squelch_gate = (audio_rate / 100) * squelch_gate_setting;
  double squelch_level = pow(10.0, squelch_cb / 100.0);
  MovingAverageUtil<Real, double, 32> moving_average;
  DoubleBufferFIFO<Real> delay_line(24000);
  PhaseDiscriminators discri = PhaseDiscriminators();  // value-init: the
  // reference never initializes m_prevArg (phasediscri.h:139 — reset()
  // covers only m_m1/m_m2Sample), so sample 0 is uninitialized memory
  // in the real program; zero it for a deterministic golden
  discri.setFMScaling((Real)(8.0 * audio_rate) / (Real)fm_dev);  // applySettings:507
  discri.reset();
  float discri_comp = 1.0f;  // audio_rate == 48000
  int squelch_count = 0;

  std::vector<float> audio_f;
  std::vector<qint16> audio_i;
  // per-stage taps (VERDICT r3 #9: the end-to-end 46-51 dB budget could
  // silently absorb a single-stage regression; these pin each boundary)
  std::vector<float> post_nco, post_resamp, post_discri;
  Complex ci;
  for (int n = 0; n < N; ++n) {
    Complex c((Real)in[2 * n], (Real)in[2 * n + 1]);
    c *= nco.nextIQ();
    post_nco.push_back((float)c.real());
    post_nco.push_back((float)c.imag());
    if (interpolator.decimate(&interp_remain, c, &ci)) {
      post_resamp.push_back((float)ci.real());
      post_resamp.push_back((float)ci.imag());
      double magsq_raw;
      Real deviation;
      Real demod = discri.phaseDiscriminatorDelta(ci, magsq_raw, deviation);
      post_discri.push_back((float)demod);
      Real magsq = (Real)(magsq_raw / (SDR_RX_SCALED * SDR_RX_SCALED));
      moving_average(magsq);
      if ((Real)moving_average < squelch_level) {
        delay_line.write(0);
        if (squelch_count > 0) squelch_count--;
      } else {
        delay_line.write(demod * discri_comp);
        if (squelch_count < 2 * squelch_gate) squelch_count++;
      }
      bool squelch_open = squelch_count > squelch_gate;
      float s_f;
      if (squelch_open) {
        s_f = bandpass.filter(delay_line.readBack(squelch_gate)) * (Real)volume;
      } else {
        s_f = 0.0f;
      }
      audio_f.push_back(s_f);
      audio_i.push_back((qint16)s_f);
      interp_remain += interp_distance;
    }
  }
  char params[256];
  snprintf(params, sizeof(params),
           "{\"input_rate\": %d, \"offset_hz\": %d, \"audio_rate\": 48000, "
           "\"rf_bw\": 12500.0, \"af_bw\": 3000.0, \"fm_dev\": %d, "
           "\"volume\": %.1f, \"squelch_gate\": %d, \"squelch_cb\": -300.0}",
           input_rate, offset_hz, fm_dev, volume, squelch_gate_setting);
  save_f32(std::string(name) + "_audio", audio_f, params);
  save_i16(std::string(name) + "_audio_i16", audio_i, params);
  save_f32(std::string(name) + "_postnco", post_nco, params);
  save_f32(std::string(name) + "_postresamp", post_resamp, params);
  save_f32(std::string(name) + "_postdiscri", post_discri, params);
}

// ---------------------------------------------------------------------------
// Group F2 (r4): AM / SSB / WFM full demod chains — the exact feed
// compositions of amdemod.cpp:101-282, ssbdemod.cpp:152-262 and
// wfmdemod.cpp:96-160 with each plugin's ctor/applySettings state.
// ---------------------------------------------------------------------------

void gen_am_chain(const char* name, int input_rate, int offset_hz,
                  uint64_t seed) {
  const int audio_rate = 48000;
  const double rf_bw = 5000.0;     // AMDemodSettings default
  const double volume = 1.0;
  const double squelch_db = -40.0;

  // AM tone: carrier at offset, 1 kHz tone, depth 0.5, amplitude 0.5 FS
  const int N = 65536;
  Rng rng(seed);
  std::vector<qint16> in(2 * N);
  for (int n = 0; n < N; ++n) {
    double env = 0.25 * (1.0 + 0.5 * cos(2.0 * M_PI * 1000.0 * n / input_rate));
    double ph = 2.0 * M_PI * offset_hz * n / input_rate;
    in[2 * n] = (qint16)lrint((env * cos(ph) + 0.001 * rng.uniform()) * 32767.0);
    in[2 * n + 1] = (qint16)lrint((env * sin(ph) + 0.001 * rng.uniform()) * 32767.0);
  }
  save_i16(std::string(name) + "_input", in,
           "{\"n_complex\": 65536, \"mod_tone\": 1000.0, \"depth\": 0.5}");

  // state per AMDemod ctor + applyChannelSettings + applySettings
  NCO nco;
  nco.setFreq((Real)(-offset_hz), (Real)input_rate);
  Interpolator interpolator;
  interpolator.create(16, input_rate, rf_bw / 2.2);  // amdemod.cpp:370
  Real interp_distance = (Real)input_rate / (Real)audio_rate;
  Real interp_remain = 0;
  MovingAverageUtil<Real, double, 16> moving_average;
  DoubleBufferFIFO<Real> squelch_delay(9600);          // amdemod.h:183
  SimpleAGC<4800> volume_agc(0.003);
  // NON-PLL envelope branch: rate/10 window (amdemod.cpp:469; the r4
  // golden wrongly used the PLL branch's rate/4 from :464 — fixed r5)
  volume_agc.resizeNew(audio_rate / 10, 0.003);
  Bandpass<Real> bandpass;
  bandpass.create(301, audio_rate, 300.0, rf_bw / 2.0);  // :373
  double squelch_level = CalcDb::powerFromdB(squelch_db);
  int squelch_count = 0;

  std::vector<float> audio_f;
  // r5 per-stage taps: delayed envelope, volume-AGC value, pre-bandpass
  // normalized demod (attribute the 55.9 dB chain floor to a stage)
  std::vector<float> env_f, agc_f, norm_f;
  Complex ci;
  for (int n = 0; n < N; ++n) {
    Complex c((Real)in[2 * n], (Real)in[2 * n + 1]);
    c *= nco.nextIQ();
    if (interpolator.decimate(&interp_remain, c, &ci)) {
      // processOneSample (amdemod.cpp:152-282), envelope (non-PLL) branch
      Real re = ci.real() / SDR_RX_SCALEF;
      Real im = ci.imag() / SDR_RX_SCALEF;
      Real magsq = re * re + im * im;
      moving_average(magsq);
      double m_magsq = moving_average.asDouble();
      squelch_delay.write(magsq);
      if (m_magsq < squelch_level) {
        if (squelch_count > 0) squelch_count--;
      } else {
        if (squelch_count < audio_rate / 10) squelch_count++;
      }
      bool squelch_open = (squelch_count >= audio_rate / 20);
      float sample;
      if (squelch_open) {
        Real demod = sqrt(squelch_delay.readBack(audio_rate / 20));
        env_f.push_back((float)demod);
        volume_agc.feed(demod);
        agc_f.push_back((float)volume_agc.getValue());
        demod = (demod - volume_agc.getValue()) / volume_agc.getValue();
        norm_f.push_back((float)demod);
        demod = bandpass.filter(demod);
        demod /= 301.0f;
        Real attack = (squelch_count - 0.05f * audio_rate) / (0.05f * audio_rate);
        sample = demod * StepFunctions::smootherstep(attack)
            * (audio_rate / 24) * (Real)volume;
      } else {
        env_f.push_back(0.0f);
        agc_f.push_back(0.0f);
        norm_f.push_back(0.0f);
        sample = 0.0f;
      }
      audio_f.push_back(sample);
      interp_remain += interp_distance;
    }
  }
  char params[192];
  snprintf(params, sizeof(params),
           "{\"input_rate\": %d, \"offset_hz\": %d, \"rf_bw\": 5000.0, "
           "\"volume\": 1.0, \"squelch_db\": -40.0, \"bandpass\": true}",
           input_rate, offset_hz);
  save_f32(std::string(name) + "_audio", audio_f, params);
  save_f32(std::string(name) + "_envelope", env_f, params);
  save_f32(std::string(name) + "_agc", agc_f, params);
  save_f32(std::string(name) + "_norm", norm_f, params);
}

// Synchronous-AM branch (amdemod.cpp:191-251): pllFilt(101,audio,200) ->
// PhaseLockComplex(0.05,0.707,1000) carrier lock -> quadrature mix ->
// SSB/DSB fftfilt -> MagAGC(12000,0.1,1e-2, threshold off) -> the
// syncAMBuff read-back quirk -> *4 "mos pifometrico" gain.
void gen_am_sync_chain(const char* name, int input_rate, int offset_hz,
                       int sync_op /*0 DSB, 1 USB, 2 LSB*/, uint64_t seed) {
  const int audio_rate = 48000;
  const double rf_bw = 5000.0;
  const double volume = 1.0;
  const double squelch_db = -40.0;

  const int N = 65536;
  Rng rng(seed);
  std::vector<qint16> in(2 * N);
  for (int n = 0; n < N; ++n) {
    double env = 0.25 * (1.0 + 0.5 * cos(2.0 * M_PI * 1000.0 * n / input_rate));
    double ph = 2.0 * M_PI * offset_hz * n / input_rate
        + 0.3;  // constant carrier phase: the PLL must acquire it
    in[2 * n] = (qint16)lrint((env * cos(ph) + 0.001 * rng.uniform()) * 32767.0);
    in[2 * n + 1] = (qint16)lrint((env * sin(ph) + 0.001 * rng.uniform()) * 32767.0);
  }
  save_i16(std::string(name) + "_input", in,
           "{\"n_complex\": 65536, \"mod_tone\": 1000.0, \"depth\": 0.5, "
           "\"carrier_phase\": 0.3}");

  NCO nco;
  nco.setFreq((Real)(-offset_hz), (Real)input_rate);
  Interpolator interpolator;
  interpolator.create(16, input_rate, rf_bw / 2.2);
  Real interp_distance = (Real)input_rate / (Real)audio_rate;
  Real interp_remain = 0;
  MovingAverageUtil<Real, double, 16> moving_average;
  DoubleBufferFIFO<Real> squelch_delay(9600);
  fftfilt dsb_filter((Real)((2.0 * rf_bw) / audio_rate), 2 * 1024);
  fftfilt ssb_filter(0.0f, (Real)(rf_bw / audio_rate), 1024);
  Lowpass<std::complex<float> > pll_filt;
  pll_filt.create(101, audio_rate, 200.0);     // amdemod.cpp:85
  PhaseLockComplex pll;
  pll.computeCoefficients(0.05, 0.707, 1000);  // amdemod.cpp:86
  MagAGC sync_agc(12000, 0.1, 1e-2);           // amdemod.cpp:59
  sync_agc.setThresholdEnable(false);          // :74
  sync_agc.resize(12000, 6000, 0.1);           // :75
  double squelch_level = CalcDb::powerFromdB(squelch_db);
  int squelch_count = 0;
  fftfilt::cmplx sync_am_buff[2 * 1024];
  int sync_am_buff_index = 0;
  std::vector<float> sync_buff_f(2 * 1024, 0.0f);

  std::vector<float> audio_f;
  // r5 per-stage taps: PLL carrier + quadrature mix + pre-attack demod
  // (attribute the chain residual to a stage instead of asserting it)
  std::vector<float> pll_carrier, post_mix, demod_f;
  Complex ci;
  for (int n = 0; n < N; ++n) {
    Complex c((Real)in[2 * n], (Real)in[2 * n + 1]);
    c *= nco.nextIQ();
    if (interpolator.decimate(&interp_remain, c, &ci)) {
      Real re = ci.real() / SDR_RX_SCALEF;
      Real im = ci.imag() / SDR_RX_SCALEF;
      Real magsq = re * re + im * im;
      moving_average(magsq);
      double m_magsq = moving_average.asDouble();
      squelch_delay.write(magsq);
      if (m_magsq < squelch_level) {
        if (squelch_count > 0) squelch_count--;
      } else {
        if (squelch_count < audio_rate / 10) squelch_count++;
      }
      bool squelch_open = (squelch_count >= audio_rate / 20);
      float sample;
      if (squelch_open) {
        // the PLL branch of processOneSample (amdemod.cpp:191-251)
        std::complex<float> s(re, im);
        s = pll_filt.filter(s);
        pll.feed(s.real(), s.imag());
        float yr = re * pll.getImag() - im * pll.getReal();
        float yi = re * pll.getReal() + im * pll.getImag();
        pll_carrier.push_back(pll.getReal());
        pll_carrier.push_back(pll.getImag());
        post_mix.push_back(yr);
        post_mix.push_back(yi);
        fftfilt::cmplx* sideband;
        std::complex<float> cs(yr, yi);
        int n_out;
        if (sync_op == 0) {
          n_out = dsb_filter.runDSB(cs, &sideband, false);
        } else {
          n_out = ssb_filter.runSSB(cs, &sideband, sync_op == 1, false);
        }
        for (int i = 0; i < n_out; i++) {
          float agcVal = sync_agc.feedAndGetValue(sideband[i]);
          fftfilt::cmplx z = sideband[i] * agcVal;
          sync_buff_f[i] = (z.real() + z.imag());
          sync_am_buff_index = 0;
        }
        (void)sync_am_buff;
        sync_am_buff_index = sync_am_buff_index < 2 * 1024 ? sync_am_buff_index : 0;
        Real demod = sync_buff_f[sync_am_buff_index++] * 4.0f;  // :229
        demod_f.push_back(demod);
        // shared tail (:245-252), bandpassEnable false for this case
        Real attack = (squelch_count - 0.05f * audio_rate) / (0.05f * audio_rate);
        sample = demod * StepFunctions::smootherstep(attack)
            * (audio_rate / 24) * (Real)volume;
      } else {
        pll_carrier.push_back(0.0f);
        pll_carrier.push_back(0.0f);
        post_mix.push_back(0.0f);
        post_mix.push_back(0.0f);
        demod_f.push_back(0.0f);
        sample = 0.0f;
      }
      audio_f.push_back(sample);
      interp_remain += interp_distance;
    }
  }
  char params[224];
  snprintf(params, sizeof(params),
           "{\"input_rate\": %d, \"offset_hz\": %d, \"rf_bw\": 5000.0, "
           "\"sync_op\": %d, \"volume\": 1.0, \"squelch_db\": -40.0}",
           input_rate, offset_hz, sync_op);
  save_f32(std::string(name) + "_audio", audio_f, params);
  save_f32(std::string(name) + "_pllcarrier", pll_carrier, params);
  save_f32(std::string(name) + "_postmix", post_mix, params);
  save_f32(std::string(name) + "_demod", demod_f, params);
}

void gen_ssb_chain(const char* name, int input_rate, int offset_hz,
                   bool agc_active, uint64_t seed, bool usb = true) {
  const int audio_rate = 48000;
  const double bandwidth = 3000.0, low_cutoff = 300.0;  // USB defaults
  const double volume = 2.0;

  // two in-band audio tones SSB-placed: complex tones at offset+700/+1900 Hz
  const int N = 65536;
  Rng rng(seed);
  std::vector<qint16> in(2 * N);
  double side = usb ? 1.0 : -1.0;  // LSB content sits BELOW the carrier
  for (int n = 0; n < N; ++n) {
    double p1 = 2.0 * M_PI * (offset_hz + side * 700.0) * n / input_rate;
    double p2 = 2.0 * M_PI * (offset_hz + side * 1900.0) * n / input_rate;
    double i = 0.3 * cos(p1) + 0.18 * cos(p2) + 0.001 * rng.uniform();
    double q = 0.3 * sin(p1) + 0.18 * sin(p2) + 0.001 * rng.uniform();
    in[2 * n] = (qint16)lrint(i * 32767.0);
    in[2 * n + 1] = (qint16)lrint(q * 32767.0);
  }
  save_i16(std::string(name) + "_input", in,
           "{\"n_complex\": 65536, \"tones\": [700.0, 1900.0]}");

  NCO nco;
  nco.setFreq((Real)(-offset_hz), (Real)input_rate);
  Interpolator interpolator;
  interpolator.create(16, input_rate, bandwidth * 1.5, 2.0);  // ssbdemod.cpp:381
  Real interp_distance = (Real)input_rate / (Real)audio_rate;
  Real interp_remain = 0;
  fftfilt ssb_filter((Real)(low_cutoff / audio_rate),
                     (Real)(bandwidth / audio_rate), 1024);
  // MagAGC per ssbdemod ctor/applySettings: agcTimeLog2 default 7 ->
  // nbSamples = 48 * 128 = 6144; threshold -40 dB, gate 4 ms
  MagAGC agc(12000, 3276.8, 1e-2);
  agc.setClampMax(SDR_RX_SCALED / 100.0);
  agc.setClamping(false);
  int agc_nb = (audio_rate / 1000) * (1 << 7);
  agc.resize(agc_nb, agc_nb / 2, 3276.8);
  agc.setStepDownDelay(agc_nb);
  agc.setThresholdEnable(true);
  agc.setThreshold(CalcDb::powerFromdB(-40.0) * (SDR_RX_SCALED * SDR_RX_SCALED));
  agc.setGate((audio_rate / 1000) * 4);
  DoubleBufferFIFO<fftfilt::cmplx> squelch_delay(2 * 48000);

  std::vector<float> audio_f, post_resamp, post_filt, agc_gain;
  Complex ci;
  fftfilt::cmplx* sideband;
  for (int n = 0; n < N; ++n) {
    Complex c((Real)in[2 * n], (Real)in[2 * n + 1]);
    c *= nco.nextIQ();
    int n_out = 0;
    if (interpolator.decimate(&interp_remain, c, &ci)) {
      post_resamp.push_back((float)ci.real());
      post_resamp.push_back((float)ci.imag());
      n_out = ssb_filter.runSSB(ci, &sideband, usb);
      interp_remain += interp_distance;
    }
    for (int i = 0; i < n_out; i++) {
      post_filt.push_back((float)sideband[i].real());
      post_filt.push_back((float)sideband[i].imag());
      float agcVal = agc_active ? agc.feedAndGetValue(sideband[i]) : 10.0;
      agc_gain.push_back(agcVal);
      fftfilt::cmplx& delayed = squelch_delay.readBack(agc.getStepDownDelay());
      squelch_delay.write(sideband[i] * agcVal);
      fftfilt::cmplx z = delayed * agc.getStepValue();
      Real demod = (z.real() + z.imag()) * 0.7;
      // ssbdemod.cpp:493-494: m_volume = settings volume / 4.0
      audio_f.push_back((float)(demod * (volume / 4.0)));
    }
  }
  char params[224];
  snprintf(params, sizeof(params),
           "{\"input_rate\": %d, \"offset_hz\": %d, \"bandwidth\": 3000.0, "
           "\"low_cutoff\": 300.0, \"usb\": %s, \"volume\": 2.0, "
           "\"agc\": %s, \"agc_time_log2\": 7}",
           input_rate, offset_hz, usb ? "true" : "false",
           agc_active ? "true" : "false");
  save_f32(std::string(name) + "_audio", audio_f, params);
  save_f32(std::string(name) + "_postresamp", post_resamp, params);
  save_f32(std::string(name) + "_postfilt", post_filt, params);
  save_f32(std::string(name) + "_agcgain", agc_gain, params);
}

void gen_wfmrx_chain(const char* name, int input_rate, int offset_hz,
                     uint64_t seed) {
  const int audio_rate = 48000;
  const double rf_bw = 180000.0, af_bw = 15000.0, fm_dev = 75000.0;
  const double volume = 1.0, squelch_db = -60.0;

  // wideband FM: 1 kHz tone at 50 kHz deviation, amplitude 0.5 FS
  const int N = 262144;
  Rng rng(seed);
  std::vector<qint16> in(2 * N);
  double phase = 0.0;
  for (int n = 0; n < N; ++n) {
    double inst = 50000.0 * cos(2.0 * M_PI * 1000.0 * n / input_rate) + offset_hz;
    phase += 2.0 * M_PI * inst / input_rate;
    in[2 * n] = (qint16)lrint((0.5 * cos(phase) + 0.001 * rng.uniform()) * 32767.0);
    in[2 * n + 1] = (qint16)lrint((0.5 * sin(phase) + 0.001 * rng.uniform()) * 32767.0);
  }
  save_i16(std::string(name) + "_input", in,
           "{\"n_complex\": 262144, \"mod_tone\": 1000.0, \"deviation\": 50000.0}");

  NCO nco;
  nco.setFreq((Real)(-offset_hz), (Real)input_rate);
  Interpolator interpolator;
  interpolator.create(16, input_rate, af_bw);  // wfmdemod.cpp:292
  Real interp_distance = (Real)input_rate / (Real)audio_rate;
  Real interp_remain = 0;
  fftfilt rf_filter(-50000.0f / 384000.0f, 50000.0f / 384000.0f, 1024);
  rf_filter.create_filter((float)(-(rf_bw / 2.0) / input_rate),
                          (float)((rf_bw / 2.0) / input_rate));  // :296-298
  PhaseDiscriminators discri = PhaseDiscriminators();  // value-init: the
  // reference never initializes m_prevArg (phasediscri.h:139 — reset()
  // covers only m_m1/m_m2Sample), so sample 0 is uninitialized memory
  // in the real program; zero it for a deterministic golden
  discri.setFMScaling((Real)(1.0 / (rf_bw / (Real)input_rate)));  // :299-300
  MovingAverageUtil<Real, double, 32> moving_average;
  double squelch_level = CalcDb::powerFromdB(squelch_db);
  int squelch_state = 0;

  std::vector<float> audio_f;
  // r5 per-stage taps (the NFM decomposition pattern): attribute the
  // chain residual to an actual stage instead of asserting it
  std::vector<float> post_nco, post_rf, post_discri;
  Complex ci;
  fftfilt::cmplx* rf;
  for (int n = 0; n < N; ++n) {
    Complex c((Real)in[2 * n], (Real)in[2 * n + 1]);
    c *= nco.nextIQ();
    post_nco.push_back((float)c.real());
    post_nco.push_back((float)c.imag());
    int rf_out = rf_filter.runFilt(c, &rf);
    for (int i = 0; i < rf_out; i++) {
      double msq = rf[i].real() * rf[i].real() + rf[i].imag() * rf[i].imag();
      Real magsq = (Real)(msq / (SDR_RX_SCALED * SDR_RX_SCALED));
      moving_average(magsq);
      if (magsq >= squelch_level) {
        if (squelch_state < rf_bw / 10) squelch_state++;
      } else {
        if (squelch_state > 0) squelch_state--;
      }
      bool squelch_open = (squelch_state > rf_bw / 20);
      Real demod;
      if (squelch_open) {
        Real fmDev;
        demod = discri.phaseDiscriminatorDelta(rf[i], msq, fmDev);
      } else {
        demod = 0;
      }
      post_rf.push_back((float)rf[i].real());
      post_rf.push_back((float)rf[i].imag());
      post_discri.push_back((float)demod);
      Complex e(demod, 0);
      if (interpolator.decimate(&interp_remain, e, &ci)) {
        audio_f.push_back((float)(ci.real() * 3276.8f * volume));
        interp_remain += interp_distance;
      }
    }
  }
  char params[224];
  snprintf(params, sizeof(params),
           "{\"input_rate\": %d, \"offset_hz\": %d, \"rf_bw\": 180000.0, "
           "\"af_bw\": 15000.0, \"fm_dev\": %0.1f, \"volume\": 1.0, "
           "\"squelch_db\": -60.0}",
           input_rate, offset_hz, fm_dev);
  save_f32(std::string(name) + "_audio", audio_f, params);
  save_f32(std::string(name) + "_postnco", post_nco, params);
  save_f32(std::string(name) + "_postrf", post_rf, params);
  save_f32(std::string(name) + "_postdiscri", post_discri, params);
}

// ---------------------------------------------------------------------------
// Group F2b (r5): DSD front end — dsddemod.cpp feed (:127-210) composition
// up to the DSDcc hand-off boundary: NCO mix -> Interpolator(16, rate,
// rfBW/2.2) -> phaseDiscriminator * demodGain (fmScaling 48000/(2 fmDev),
// applySettings:495) -> 16-tap magsq moving-average squelch with the
// 480*gate delay line (:156-199). The emitted `sample` stream is exactly
// what the reference hands DSDcc per audio sample.
// ---------------------------------------------------------------------------

void gen_dsd_chain(const char* name, int input_rate, int offset_hz,
                   uint64_t seed) {
  const double rf_bw = 12500.0, fm_dev = 5400.0, demod_gain = 1.0;
  const double squelch_db = -40.0;
  const int gate = 480;  // settings gate 1 (10 ms) * 48k (:40)

  // 4FSK: random dibits at 4800 baud, inst freq = sym/3 * fmDev
  const int N = 131072;
  Rng rng(seed);
  const int sps = input_rate / 4800;
  std::vector<qint16> in(2 * N);
  double phase = 0.0;
  static const int levels[4] = {1, 3, -1, -3};
  int sym = 0;
  for (int n = 0; n < N; ++n) {
    if (n % sps == 0) sym = levels[rng.next() & 3];
    double inst = (sym / 3.0) * fm_dev + offset_hz;
    phase += 2.0 * M_PI * inst / input_rate;
    in[2 * n] = (qint16)lrint((0.5 * cos(phase) + 0.002 * rng.uniform()) * 32767.0);
    in[2 * n + 1] = (qint16)lrint((0.5 * sin(phase) + 0.002 * rng.uniform()) * 32767.0);
  }
  save_i16(std::string(name) + "_input", in,
           "{\"n_complex\": 131072, \"baud\": 4800, \"fm_dev\": 5400.0}");

  NCO nco;
  nco.setFreq((Real)(-offset_hz), (Real)input_rate);
  Interpolator interpolator;
  interpolator.create(16, input_rate, rf_bw / 2.2);  // applyChannelSettings
  Real interp_distance = (Real)input_rate / 48000.0f;
  Real interp_remain = 0;
  MovingAverageUtil<Real, double, 16> moving_average;
  DoubleBufferFIFO<Real> squelch_delay(24000);  // dsddemod.cpp:61
  PhaseDiscriminators discri = PhaseDiscriminators();  // (see note above)
  discri.setFMScaling(48000.0f / (2.0f * (Real)fm_dev));  // :495
  double squelch_level = pow(10.0, squelch_db / 10.0);
  int squelch_count = 0;

  std::vector<float> post_discri, sample_f;
  Complex ci;
  for (int n = 0; n < N; ++n) {
    Complex c((Real)in[2 * n], (Real)in[2 * n + 1]);
    c *= nco.nextIQ();
    if (interpolator.decimate(&interp_remain, c, &ci)) {
      Real re = ci.real() / SDR_RX_SCALED;
      Real im = ci.imag() / SDR_RX_SCALED;
      Real magsq = re * re + im * im;
      moving_average(magsq);
      Real demod = discri.phaseDiscriminator(ci) * (Real)demod_gain;
      post_discri.push_back((float)demod);
      bool squelch_open;
      if (moving_average.asDouble() > squelch_level) {
        if (squelch_count < gate * 2) squelch_count++;
        squelch_delay.write(demod);
      } else {
        if (squelch_count > 0) squelch_count--;
        squelch_delay.write(0);
      }
      squelch_open = squelch_count > gate;
      sample_f.push_back(squelch_open ? (float)squelch_delay.readBack(gate)
                                      : 0.0f);
      interp_remain += interp_distance;
    }
  }
  char params[160];
  snprintf(params, sizeof(params),
           "{\"input_rate\": %d, \"offset_hz\": %d, \"rf_bw\": 12500.0, "
           "\"fm_dev\": 5400.0, \"squelch_db\": -40.0, \"gate\": 480}",
           input_rate, offset_hz);
  save_f32(std::string(name) + "_postdiscri", post_discri, params);
  save_f32(std::string(name) + "_sample", sample_f, params);
}

// ---------------------------------------------------------------------------
// Group F3 (r4): BFM stereo chain — bfmdemod.cpp:118-250 feed composition
// (RDS branch excluded: RDSDemod is a QObject; the MPX math ends at the
// 57 kHz mix which the stereo path below already pins at 38 kHz).
// ---------------------------------------------------------------------------

void gen_bfm_chain(const char* name, int input_rate, int offset_hz,
                   uint64_t seed) {
  const int audio_rate = 48000;
  const double rf_bw = 180000.0, af_bw = 15000.0;
  const double volume = 1.0, squelch_db = -60.0;
  const double fm_excursion = 750000.0;  // bfmdemod.h:266 default_excursion

  // FM stereo multiplex: L = 1 kHz, R = 2.5 kHz, 19 kHz pilot
  const int N = 262144;
  Rng rng(seed);
  std::vector<qint16> in(2 * N);
  double phase = 0.0;
  for (int n = 0; n < N; ++n) {
    double t = (double)n / input_rate;
    double L = 0.6 * sin(2.0 * M_PI * 1000.0 * t);
    double R = 0.6 * sin(2.0 * M_PI * 2500.0 * t);
    // broadcast phase convention (ITU-R BS.450 / the reference's
    // StereoPhaseLock harmonic): subcarrier = sin(2*theta) with
    // pilot = sin(theta) — a cos/cos multiplex is ORTHOGONAL to the
    // PLL's sin(2x) harmonic and silently nulls the stereo difference
    double theta = 2.0 * M_PI * 19000.0 * t;
    double mpx = 0.45 * (L + R) + 0.45 * sin(2.0 * theta) * (L - R)
        + 0.1 * sin(theta);
    double inst = 75000.0 * mpx + offset_hz;
    phase += 2.0 * M_PI * inst / input_rate;
    in[2 * n] = (qint16)lrint((0.5 * cos(phase) + 0.0005 * rng.uniform()) * 32767.0);
    in[2 * n + 1] = (qint16)lrint((0.5 * sin(phase) + 0.0005 * rng.uniform()) * 32767.0);
  }
  save_i16(std::string(name) + "_input", in,
           "{\"n_complex\": 262144, \"tone_l\": 1000.0, \"tone_r\": 2500.0, "
           "\"pilot\": 19000.0, \"deviation\": 75000.0}");

  NCO nco;
  nco.setFreq((Real)(-offset_hz), (Real)input_rate);
  fftfilt rf_filter(-50000.0f / 384000.0f, 50000.0f / 384000.0f, 1024);
  rf_filter.create_filter((float)(-(rf_bw / 2.0) / input_rate),
                          (float)((rf_bw / 2.0) / input_rate));
  PhaseDiscriminators discri = PhaseDiscriminators();  // value-init: the
  // reference never initializes m_prevArg (phasediscri.h:139 — reset()
  // covers only m_m1/m_m2Sample), so sample 0 is uninitialized memory
  // in the real program; zero it for a deterministic golden
  discri.setFMScaling((Real)(input_rate / fm_excursion));  // :429
  StereoPhaseLock pilot_pll(0, 0, 0);
  pilot_pll.configure((Real)(19000.0 / input_rate),
                      (Real)(50.0 / input_rate), 0.01);  // :410
  Interpolator interp, interp_stereo;
  interp.create(16, input_rate, af_bw);          // :414
  interp_stereo.create(16, input_rate, af_bw);   // :418
  Real dist = (Real)input_rate / (Real)audio_rate;
  Real remain = 0, remain_st = 0;
  LowPassFilterRC deemph_x((Real)(50.0 * audio_rate * 1.0e-6));
  LowPassFilterRC deemph_y((Real)(50.0 * audio_rate * 1.0e-6));
  double squelch_level = pow(10.0, squelch_db / 10.0);
  int squelch_state = 0;

  std::vector<float> audio_lr, post_discri, pilot_tap;
  Complex ci, cs;
  Real pilot_samples[4] = {0, 0, 0, 0};
  fftfilt::cmplx* rf;
  for (int n = 0; n < N; ++n) {
    Complex c((Real)in[2 * n] / SDR_RX_SCALEF,
              (Real)in[2 * n + 1] / SDR_RX_SCALEF);
    c *= nco.nextIQ();
    int rf_out = rf_filter.runFilt(c, &rf);
    for (int i = 0; i < rf_out; i++) {
      double msq = rf[i].real() * rf[i].real() + rf[i].imag() * rf[i].imag();
      if (msq >= squelch_level) {
        if (squelch_state < rf_bw / 10) squelch_state++;
      } else {
        if (squelch_state > 0) squelch_state--;
      }
      Real demod = (squelch_state > rf_bw / 20)
          ? discri.phaseDiscriminator(rf[i]) : 0;
      post_discri.push_back((float)demod);

      Real sample_stereo = 0.0f;
      pilot_pll.process(demod, pilot_samples);
      pilot_tap.push_back((float)pilot_samples[1]);
      // m_lsbStereo false: the 1.17 path (bfmdemod.cpp:211-219)
      Complex s(demod * 1.17 * pilot_samples[1], 0);
      if (interp_stereo.decimate(&remain_st, s, &cs)) {
        sample_stereo = cs.real();
        remain_st += dist;
      }
      Complex e(demod, 0);
      if (interp.decimate(&remain, e, &ci)) {
        Real deemph_l, deemph_r;
        deemph_x.process(ci.real() + sample_stereo, deemph_l);
        deemph_y.process(ci.real() - sample_stereo, deemph_r);
        audio_lr.push_back((float)(deemph_l * (1 << 12) * volume));
        audio_lr.push_back((float)(deemph_r * (1 << 12) * volume));
        remain += dist;
      }
    }
  }
  char params[224];
  snprintf(params, sizeof(params),
           "{\"input_rate\": %d, \"offset_hz\": %d, \"rf_bw\": 180000.0, "
           "\"af_bw\": 15000.0, \"stereo\": true, \"deemphasis_us\": 50.0, "
           "\"volume\": 1.0, \"squelch_db\": -60.0}",
           input_rate, offset_hz);
  save_f32(std::string(name) + "_audio_lr", audio_lr, params);
  save_f32(std::string(name) + "_postdiscri", post_discri, params);
  save_f32(std::string(name) + "_pilot", pilot_tap, params);
}

// ---------------------------------------------------------------------------
// Group G: CTCSS detector + AF squelch sequences.
// ---------------------------------------------------------------------------

void gen_ctcss() {
  // NFM config: setCoefficients(audioRate/16, audioRate/8) at 48 kHz
  // (nfmdemod.cpp:86), analyze() fed every 8th sample (feed loop :243).
  CTCSSDetector det;
  det.setCoefficients(48000 / 16, 48000 / 8.0f);
  det.reset();  // the reference never zeroes u0/u1 before the first block
  // (ctcssdetector.cpp:22-27 new[] without init; :146 reads them) — the
  // first detection is uninitialized memory in the real program; reset()
  // makes the golden deterministic
  const int N = 48000 * 2;
  std::vector<float> tone_idx;
  Rng rng(0x5eed0040ULL);
  int n_tones = det.getNTones();
  const Real* tones = det.getToneSet();
  (void)tones;
  for (int n = 0; n < N; ++n) {
    // 88.5 Hz CTCSS + voice-band tone
    Real s = (Real)(0.15 * sin(2.0 * M_PI * 88.5 * n / 48000.0) +
                    0.5 * sin(2.0 * M_PI * 700.0 * n / 48000.0) +
                    0.05 * rng.uniform());
    if ((n & 7) == 7) {
      Real s6k = s;
      if (det.analyze(&s6k)) {
        int max_idx;
        bool got = det.getDetectedTone(max_idx);
        tone_idx.push_back(got ? (float)max_idx : -1.0f);
      }
    }
  }
  char params[96];
  snprintf(params, sizeof(params), "{\"n_tones\": %d, \"ctcss_hz\": 88.5}", n_tones);
  save_f32("ctcss_detected_idx", tone_idx, params);
}

int main_impl(const char* dir) {
  g_dir = dir;
  gen_decimators_ii();
  gen_decimators_u();
  gen_decimators_float();
  gen_nco();
  gen_fftfilt();
  gen_interpolator();
  gen_channelizer();
  gen_nfm_chain("nfm48", 48000, 0, 2000, 1.0, 0x5eed0050ULL);
  gen_nfm_chain("nfm96", 96000, 12000, 2000, 1.0, 0x5eed0051ULL);
  // r5: the PRODUCT path's channel rate (10 MS/s /64 = 156250 Hz,
  // resampler ratio 625/192 to 48 kHz) — the awkward-rational case the
  // reference-exact schedule must cover
  gen_nfm_chain("nfm156", 156250, 20000, 2000, 1.0, 0x5eed0059ULL);
  gen_am_chain("am96", 96000, 5000, 0x5eed0052ULL);
  gen_am_sync_chain("amsync96", 96000, 5000, 1 /*USB*/, 0x5eed0057ULL);
  gen_ssb_chain("ssb96", 96000, 3000, false, 0x5eed0053ULL);
  gen_ssb_chain("ssb96agc", 96000, 3000, true, 0x5eed0054ULL);
  gen_ssb_chain("ssb96lsb", 96000, 3000, true, 0x5eed0058ULL, false);
  gen_wfmrx_chain("wfmrx384", 384000, 0, 0x5eed0055ULL);
  gen_dsd_chain("dsd96", 96000, 6000, 0x5eed0058ULL);
  gen_bfm_chain("bfm384", 384000, 0, 0x5eed0056ULL);
  gen_ctcss();
  gen_tx_goldens();

  std::string manifest = "{\n";
  for (size_t i = 0; i < g_manifest.size(); ++i) {
    manifest += g_manifest[i];
    if (i + 1 < g_manifest.size()) manifest += ",";
    manifest += "\n";
  }
  manifest += "}\n";
  write_bytes("manifest.json", manifest.data(), manifest.size());
  printf("wrote %zu goldens to %s\n", g_manifest.size(), dir);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <output-dir>\n", argv[0]);
    return 2;
  }
  return main_impl(argv[1]);
}
