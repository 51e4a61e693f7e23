// Unsigned-input decimator goldens — separate TU because decimatorsu.h
// redefines decimation_shifts<> vs decimators.h. Uses the rtlsdr u8 ingest
// configuration (rtlsdrthread.h:55):
//   DecimatorsU<qint32, quint8, SDR_RX_SAMP_SZ=16, InputBits=8, Shift=127>
#include <QtGlobal>

#include <cmath>
#include <vector>

#include "dsp/dsptypes.h"
#include "dsp/decimatorsu.h"

#include "ref_golden_common.h"

void gen_decimators_u() {
  typedef DecimatorsU<qint32, quint8, 16, 8, 127> DecU;
  const int N = 16384;
  GoldenRng rng(0x5eed0002ULL);
  std::vector<quint8> in(2 * N);
  for (int n = 0; n < N; ++n) {
    double ph = 2.0 * M_PI * 0.0137 * n;
    in[2 * n] = (quint8)(127 + lrint(90 * cos(ph) + 20 * rng.uniform()));
    in[2 * n + 1] = (quint8)(127 + lrint(90 * sin(ph) + 20 * rng.uniform()));
  }
  {
    std::vector<qint16> flat(in.begin(), in.end());
    save_i16_g("decu_input", flat,
               "{\"n_complex\": 16384, \"input_bits\": 8, \"offset\": 127}");
  }
  DecU dec;
  SampleVector out(N);
  SampleVector::iterator it = out.begin();
  dec.decimate4_cen(&it, in.data(), (qint32)in.size());
  size_t n = (size_t)(it - out.begin());
  std::vector<qint16> flat(2 * n);
  for (size_t k = 0; k < n; ++k) {
    flat[2 * k] = out[k].real();
    flat[2 * k + 1] = out[k].imag();
  }
  save_i16_g("decu_cen_l2", flat, "{\"log2\": 2, \"fc_pos\": \"cen\"}");
}
