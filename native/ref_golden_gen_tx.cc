// Tx-path goldens from the ACTUAL reference code (VERDICT r3 #3: the Tx
// interpolation cascade and modulators were previously validated only by
// self-loopback, which a shared misreading survives). Separate TU because
// interpolators.h pulls in inthalfbandfilterdb.h configurations that the
// main TU's decimator/EO includes would collide with.
//
// Groups:
//   H1  Interpolators<qint16,16,16> device Tx cascades x2/x4/x16/x64
//       (interpolators.h:103-130 interpolateN_cen, the filesinkthread.h:73
//       configuration; HB orders 64/32/16 up the chain).
//   H2  UpChannelizer-style interpolation chains: IntHalfbandFilterDB
//       <qint32,96> workInterpolateCenter/LowerHalf/UpperHalf driven by the
//       exact pull-model loop of upchannelizer.cpp:51-88.
//   H3  NFM modulator composition (plugins/channeltx/modnfm/nfmmod.cpp
//       pull:104-146 + modulateSample:162-182 + pullAF tone input): NCOF
//       tone -> Bandpass(301,48k,300,afBW) -> pi/378 phase step -> -1 dB
//       cos/sin -> Interpolator(48 phases, rfBW/2.2, 3 taps) to the channel
//       rate -> carrier NCO. Also a ctcssOn case (nfmmod.cpp:170-172).
#include <QtGlobal>

#include <cmath>
#include <cstdint>
#include <cstring>  // interpolators.h uses memset without including it
#include <string>
#include <vector>

using std::memset;

#include "dsp/dsptypes.h"
#include "dsp/interpolators.h"
#include "dsp/interpolator.h"
#include "dsp/nco.h"
#include "dsp/ncof.h"
#include "dsp/bandpass.h"
#include "dsp/fftfilt.h"

#include "ref_golden_common.h"

namespace {

// 12-bit int16 I/Q tones + light noise (same construction as the Rx groups;
// inputs are saved so consumers never reproduce the PRNG).
std::vector<qint16> make_iq(int n, double f1, double f2, uint64_t seed) {
  GoldenRng rng(seed);
  std::vector<qint16> v(2 * n);
  for (int i = 0; i < n; ++i) {
    double p1 = 2.0 * M_PI * f1 * i, p2 = 2.0 * M_PI * f2 * i;
    double re = 0.35 * cos(p1) + 0.2 * cos(p2) + 0.06 * rng.uniform();
    double im = 0.35 * sin(p1) + 0.2 * sin(p2) + 0.06 * rng.uniform();
    v[2 * i] = (qint16)lrint(re * 2047.0);
    v[2 * i + 1] = (qint16)lrint(im * 2047.0);
  }
  return v;
}

// --- H1: device Tx interpolation cascades ---------------------------------

void gen_tx_cascades() {
  typedef Interpolators<qint16, 16, 16> TxInterp;  // filesinkthread.h:73
  const int N = 8192;
  std::vector<qint16> in = make_iq(N, 0.0137, -0.0231, 0x5eed0060ULL);
  save_i16_g("txinterp_input", in,
             "{\"n_complex\": 8192, \"input_bits\": 12, \"f1\": 0.0137, "
             "\"f2\": -0.0231, \"noise\": 0.06}");

  struct Case { const char* name; int log2; };
  const Case cases[] = {
      {"txinterp_cen_l1", 1}, {"txinterp_cen_l2", 2},
      {"txinterp_cen_l4", 4}, {"txinterp_cen_l6", 6},
  };
  for (const Case& c : cases) {
    SampleVector sv(N);
    for (int i = 0; i < N; ++i) sv[i] = Sample(in[2 * i], in[2 * i + 1]);
    TxInterp interp;
    std::vector<qint16> out(2 * N << c.log2);
    SampleVector::iterator it = sv.begin();
    switch (c.log2) {
      case 1: interp.interpolate2_cen(&it, out.data(), (qint32)out.size()); break;
      case 2: interp.interpolate4_cen(&it, out.data(), (qint32)out.size()); break;
      case 4: interp.interpolate16_cen(&it, out.data(), (qint32)out.size()); break;
      default: interp.interpolate64_cen(&it, out.data(), (qint32)out.size()); break;
    }
    char params[128];
    snprintf(params, sizeof(params),
             "{\"log2\": %d, \"sdr_bits\": 16, \"output_bits\": 16}", c.log2);
    save_i16_g(c.name, out, params);
  }
}

// --- H2: UpChannelizer pull chains ----------------------------------------

// upchannelizer.h:32: UPCHANNELIZER_HB_FILTER_ORDER 96, non-SSE path uses
// IntHalfbandFilterDB<qint32, 96> (upchannelizer.cpp:236-258).
typedef IntHalfbandFilterDB<qint32, 96> UpHB;

struct UpStage {
  UpHB f;
  int mode;  // 0 = center, 1 = lower half, 2 = upper half
  bool work(Sample* in, Sample* out) {
    switch (mode) {
      case 0: return f.workInterpolateCenter(in, out);
      case 1: return f.workInterpolateLowerHalf(in, out);
      default: return f.workInterpolateUpperHalf(in, out);
    }
  }
};

void gen_upchan_chain(const char* name, const std::vector<int>& modes,
                      double f1, double f2) {
  const int N = 8192;
  std::vector<qint16> in = make_iq(N, f1, f2, 0x5eed0070ULL + modes.size());
  {
    char params[160];
    snprintf(params, sizeof(params),
             "{\"n_complex\": 8192, \"input_bits\": 12, \"f1\": %.8f, "
             "\"f2\": %.8f, \"noise\": 0.06}", f1, f2);
    save_i16_g(std::string(name) + "_input", in, params);
  }
  // The exact pull loop of upchannelizer.cpp:51-88: stage[0] produces the
  // output-rate stream; the LAST stage pulls from the source; stage i reads
  // stage i+1's output. m_sampleIn starts default-initialized (0,0) like
  // the member in the reference.
  std::vector<UpStage*> stages;
  for (int m : modes) { UpStage* s = new UpStage(); s->mode = m; stages.push_back(s); }
  std::vector<Sample> stageSamples(modes.size());
  Sample sampleIn;
  size_t src_pos = 0;
  const size_t n_out = (size_t)(N - 8) << modes.size();
  std::vector<qint16> out;
  out.reserve(2 * n_out);
  for (size_t k = 0; k < n_out; ++k) {
    for (size_t i = 0; i < stages.size(); ++i) {
      if (i == stages.size() - 1) {
        if (stages[i]->work(&sampleIn, &stageSamples[i])) {
          if (src_pos < (size_t)N) {
            sampleIn = Sample(in[2 * src_pos], in[2 * src_pos + 1]);
            ++src_pos;
          } else {
            sampleIn = Sample(0, 0);
          }
        }
      } else {
        if (!stages[i]->work(&stageSamples[i + 1], &stageSamples[i])) break;
      }
    }
    out.push_back(stageSamples[0].real());
    out.push_back(stageSamples[0].imag());
  }
  for (UpStage* s : stages) delete s;
  std::string params = "{\"modes\": [";
  for (size_t i = 0; i < modes.size(); ++i) {
    params += std::to_string(modes[i]);
    if (i + 1 < modes.size()) params += ", ";
  }
  params += "], \"order\": 96}";
  save_i16_g(name, out, params);
}

void gen_upchan() {
  // mode codes as in the Rx channelizer goldens: 0 centre, 1 lower, 2 upper
  gen_upchan_chain("upchan_cen_cen", {0, 0}, 0.0137, -0.0231);
  gen_upchan_chain("upchan_low_up", {1, 2}, 0.0137, -0.0231);
  gen_upchan_chain("upchan_up_low_cen", {2, 1, 0}, 0.0137, -0.0231);
}

// --- H3: NFM modulator composition ----------------------------------------

void gen_nfmmod(const char* name, double out_rate, double offset_hz,
                bool ctcss) {
  const double audio_rate = 48000.0;
  const double rf_bw = 12500.0, af_bw = 3000.0, fm_dev = 5000.0;
  const int N_OUT = 65536;

  // state per NFMMod ctor + applyChannelSettings/applySettings
  NCOF toneNco;   toneNco.setFreq(1000.0f, (Real)audio_rate);
  NCOF ctcssNco;  ctcssNco.setFreq(88.5f, (Real)audio_rate);
  NCO carrierNco; carrierNco.setFreq((Real)offset_hz, (Real)out_rate);
  Interpolator interpolator;
  interpolator.create(48, audio_rate, rf_bw / 2.2, 3.0);
  Real distance = (Real)(audio_rate / out_rate);
  Real remain = 0;
  Bandpass<Real> bandpass;
  bandpass.create(301, audio_rate, 300.0, af_bw);
  float modPhasor = 0.0f;
  Complex modSample;  // default (0,0) like the member

  std::vector<float> af_used;   // the exact tone sequence fed to pullAF
  std::vector<float> out_f;
  for (int k = 0; k < N_OUT; ++k) {
    Complex ci;
    // pull() — audio_rate <= out_rate here, the interpolate branch
    if (interpolator.interpolate(&remain, modSample, &ci)) {
      // modulateSample() with NFMModInputTone
      Real t = toneNco.next();
      af_used.push_back((float)t);
      if (ctcss) {
        modPhasor += (Real)(fm_dev / audio_rate)
            * (0.85f * bandpass.filter(t) + 0.15f * 378.0f * ctcssNco.next())
            * (Real)(M_PI / 378.0);
      } else {
        modPhasor += (Real)(fm_dev / audio_rate) * bandpass.filter(t)
            * (Real)(M_PI / 378.0);
      }
      modSample.real(cos(modPhasor) * 0.891235351562f * SDR_TX_SCALEF);
      modSample.imag(sin(modPhasor) * 0.891235351562f * SDR_TX_SCALEF);
    }
    remain += distance;
    ci *= carrierNco.nextIQ();
    out_f.push_back((float)ci.real());
    out_f.push_back((float)ci.imag());
  }
  char params[224];
  snprintf(params, sizeof(params),
           "{\"audio_rate\": 48000.0, \"out_rate\": %.1f, \"offset_hz\": %.1f, "
           "\"rf_bw\": 12500.0, \"af_bw\": 3000.0, \"fm_dev\": 5000.0, "
           "\"tone\": 1000.0, \"ctcss\": %s, \"ctcss_hz\": 88.5}",
           out_rate, offset_hz, ctcss ? "true" : "false");
  save_f32_g(std::string(name) + "_af", af_used, params);
  save_f32_g(name, out_f, params);
}

// --- WFM modulator composition (wfmmod.cpp pull:110-160, file-input
// branch so the AF interpolator is exercised): AF at 48 kHz interpolated
// to the channel rate, FM phasor there (2*pi convention, :142), rfBw/2
// OLA band filter (create_filter(-rfBw/2, rfBw/2), :455-457), carrier NCO.
void gen_wfmmod(const char* name, double out_rate, double offset_hz) {
  const double audio_rate = 48000.0;
  const double rf_bw = 180000.0, fm_dev = 75000.0;
  const int N_OUT = 65536;

  NCOF toneNco;   toneNco.setFreq(1000.0f, (Real)audio_rate);
  NCO carrierNco; carrierNco.setFreq((Real)offset_hz, (Real)out_rate);
  Interpolator interpolator;
  interpolator.create(48, audio_rate, rf_bw / 2.2, 3.0);  // wfmmod.cpp:454
  Real distance = (Real)(audio_rate / out_rate);
  Real remain = 0;
  fftfilt rfFilter(-62500.0f / 384000.0f, 62500.0f / 384000.0f, 1024);
  rfFilter.create_filter((float)(-(rf_bw / 2.0) / out_rate),
                         (float)((rf_bw / 2.0) / out_rate));
  float modPhasor = 0.0f;
  Complex modSample;  // (0,0) like the member
  fftfilt::cmplx rfBuffer[1024] = {};  // reference allocates (reads zeros
  int rfBufferIndex = 0;               // before the first flush),
                                       // wfmmod.cpp:147-158

  std::vector<float> af_used;
  std::vector<float> out_f;
  for (int k = 0; k < N_OUT; ++k) {
    Complex ri, ci;
    if (interpolator.interpolate(&remain, modSample, &ri)) {
      Real t = toneNco.next();
      af_used.push_back((float)t);
      modSample = Complex(t, 0.0f);
    }
    remain += distance;
    modPhasor += (Real)(fm_dev / out_rate) * ri.real() * (Real)(M_PI * 2.0);
    ci = Complex(cos(modPhasor) * 0.891235351562f * SDR_TX_SCALEF,
                 sin(modPhasor) * 0.891235351562f * SDR_TX_SCALEF);
    fftfilt::cmplx* rf;
    int rf_out = rfFilter.runFilt(ci, &rf);
    if (rf_out > 0) {
      for (int i = 0; i < rf_out && i < 1024; ++i) rfBuffer[i] = rf[i];
      rfBufferIndex = 0;
    }
    Complex co = rfBuffer[rfBufferIndex] * carrierNco.nextIQ();
    rfBufferIndex++;
    out_f.push_back((float)co.real());
    out_f.push_back((float)co.imag());
  }
  char params[192];
  snprintf(params, sizeof(params),
           "{\"audio_rate\": 48000.0, \"out_rate\": %.1f, \"offset_hz\": %.1f, "
           "\"rf_bw\": 180000.0, \"fm_dev\": 75000.0, \"tone\": 1000.0}",
           out_rate, offset_hz);
  save_f32_g(std::string(name) + "_af", af_used, params);
  save_f32_g(name, out_f, params);
}

}  // namespace

void gen_tx_goldens() {
  gen_tx_cascades();
  gen_upchan();
  gen_nfmmod("nfmmod96", 96000.0, 0.0, false);
  gen_nfmmod("nfmmod96_off12k", 96000.0, 12000.0, false);
  gen_nfmmod("nfmmod96_ctcss", 96000.0, 0.0, true);
  gen_wfmmod("wfmmod384", 384000.0, 0.0);
}
