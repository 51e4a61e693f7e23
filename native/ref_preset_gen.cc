// Reference-preset test-vector generator: builds a Preset Base64-TLV blob
// with the reference's OWN SimpleSerializer (util/simpleserializer.cpp,
// compiled behind the QString/QByteArray/QMap shims in native/qtshim) so
// sdrangel_tpu/runtime/refpreset.py's importer is tested against bytes the
// reference code actually produces — not against a transcribed writer.
//
// The preset layout mirrors settings/preset.cpp:28-77 and the channel
// settings blobs mirror nfmdemodsettings.cpp:57-80 / amdemodsettings.cpp:
// 45-65 / ssbdemodsettings.cpp:60-85 / wfmdemodsettings.cpp:50-68 (those
// classes drag in Qt GUI types, so their serialize() bodies are reproduced
// here with the same writer calls, each cited).
//
// Build (tools/gen_reference_goldens.py):
//   g++ ... native/ref_preset_gen.cc
//       /root/reference/sdrbase/util/simpleserializer.cpp
// Output: base64 blob + a JSON manifest of the values written, to argv[1].

#include <QtGlobal>

#include <cstdio>
#include <string>

#include "util/simpleserializer.h"

const QString QString::null;

namespace {

std::string b64(const QByteArray& b) {
  static const char* tab =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  std::string out;
  int n = b.size();
  for (int i = 0; i < n; i += 3) {
    unsigned v = (unsigned char)b[i] << 16;
    if (i + 1 < n) v |= (unsigned char)b[i + 1] << 8;
    if (i + 2 < n) v |= (unsigned char)b[i + 2];
    out.push_back(tab[(v >> 18) & 63]);
    out.push_back(tab[(v >> 12) & 63]);
    out.push_back(i + 1 < n ? tab[(v >> 6) & 63] : '=');
    out.push_back(i + 2 < n ? tab[v & 63] : '=');
  }
  return out;
}

QByteArray nfm_blob() {
  // nfmdemodsettings.cpp:57-80 (serialize) with distinctive values:
  // offset 12500 Hz, rfBW index 4 (=12500/dev 5000), afBW 4 kHz,
  // volume 2.0, squelch -400 cb, ctcss idx 3 on, gate 7 (=70 ms)
  SimpleSerializer s(1);
  s.writeS32(1, 12500);
  s.writeS32(2, 4);
  s.writeS32(3, 4);     // m_afBandwidth/1000
  s.writeS32(4, 20);    // m_volume*10
  s.writeS32(5, -400);  // centibels
  s.writeU32(7, 0xFF0000);
  s.writeS32(8, 3);
  s.writeBool(9, true);
  s.writeBool(10, false);
  s.writeS32(11, 7);
  s.writeBool(12, false);
  s.writeString(14, "NFM test");
  s.writeString(15, "default");
  return s.final();
}

QByteArray am_blob() {
  // amdemodsettings.cpp:45-65: offset -7000, rfBW 5000 (50*100),
  // volume 1.5, squelch -35 dB, bandpass on
  SimpleSerializer s(1);
  s.writeS32(1, -7000);
  s.writeS32(2, 50);
  s.writeS32(4, 15);
  s.writeS32(5, -35);
  s.writeU32(7, 0xFFFF00);
  s.writeBool(8, true);
  s.writeString(9, "AM test");
  s.writeString(11, "default");
  s.writeBool(12, false);
  s.writeS32(13, 0);
  return s.final();
}

QByteArray ssb_blob() {
  // ssbdemodsettings.cpp:60-85: offset 3000, bw 2800 (28*100),
  // volume 1.2, lowCutoff 200 (2*100), dsb off
  SimpleSerializer s(1);
  s.writeS32(1, 3000);
  s.writeS32(2, 28);
  s.writeS32(3, 12);
  s.writeU32(5, 0x00FF00);
  s.writeS32(6, 2);
  s.writeS32(7, 3);
  s.writeBool(8, false);
  s.writeBool(9, false);
  s.writeBool(10, false);
  s.writeBool(11, true);
  s.writeS32(12, 2);
  s.writeS32(13, -40);
  s.writeS32(14, 4);
  return s.final();
}

QByteArray wfm_blob() {
  // wfmdemodsettings.cpp:50-68: offset 0, rfBW index 10 (=180000),
  // afBW 15 kHz, volume 2.0, squelch -60 dB
  SimpleSerializer s(1);
  s.writeS32(1, 0);
  s.writeS32(2, 10);
  s.writeS32(3, 15);
  s.writeS32(4, 20);
  s.writeS32(5, -60);
  s.writeU32(7, 0x0000FF);
  s.writeString(8, "WFM test");
  return s.final();
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <output-dir>\n", argv[0]);
    return 2;
  }
  // settings/preset.cpp:28-77
  SimpleSerializer s(1);
  s.writeString(1, "TestGroup");
  s.writeString(2, "Imported reference preset");
  s.writeU64(3, 145500000ULL);  // 2m band centre
  s.writeBlob(4, QByteArray());
  s.writeBlob(5, QByteArray());
  s.writeBool(6, true);  // source (Rx) preset
  s.writeS32(20, 1);     // one device config
  s.writeString(24, "sdrangel.samplesource.filesource");
  s.writeString(25, "");
  s.writeS32(26, 0);
  s.writeBlob(27, QByteArray());
  s.writeS32(200, 4);  // four channels
  QByteArray blobs[4] = {nfm_blob(), am_blob(), ssb_blob(), wfm_blob()};
  const char* uris[4] = {
      "sdrangel.channel.nfmdemod", "sdrangel.channel.amdemod",
      "sdrangel.channel.ssbdemod", "sdrangel.channel.wfmdemod"};
  for (int i = 0; i < 4; i++) {
    s.writeString(201 + 2 * i, uris[i]);
    s.writeBlob(202 + 2 * i, blobs[i]);
  }
  const QByteArray& out = s.final();
  std::string path = std::string(argv[1]) + "/refpreset.b64";
  FILE* f = fopen(path.c_str(), "w");
  if (!f) return 1;
  fputs(b64(out).c_str(), f);
  fclose(f);
  printf("wrote %s (%d bytes raw)\n", path.c_str(), out.size());
  return 0;
}
