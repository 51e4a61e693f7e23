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

QByteArray bfm_blob() {
  // bfmdemodsettings.cpp:53-80 (serialize): offset 90000, rfBW index 7
  // (=220000), afBW 12 kHz, volume 1.8, squelch -55 dB, stereo on
  SimpleSerializer s(1);
  s.writeS32(1, 90000);
  s.writeS32(2, 7);
  s.writeS32(3, 12);   // m_afBandwidth/1000
  s.writeS32(4, 18);   // m_volume*10
  s.writeS32(5, -55);
  s.writeU32(7, 0x5078E4);
  s.writeBool(9, true);   // m_audioStereo
  s.writeBool(10, false); // m_lsbStereo
  s.writeString(12, "BFM test");
  s.writeString(13, "default");
  return s.final();
}

QByteArray dsd_blob() {
  // dsddemodsettings.cpp:57-92 (serialize): offset -250000, rfBW 12500
  // (125*100), gain 1.0 (100/100), fmDev 5400 (54*100), squelch -37.5 dB
  // (-375/10), gate 5, volume 2.0, baud 2400
  SimpleSerializer s(1);
  s.writeS32(1, -250000);
  s.writeS32(2, 125);
  s.writeS32(3, 100);
  s.writeS32(4, 54);
  s.writeS32(5, -375);
  s.writeU32(7, 0x00FFFF);
  s.writeS32(8, 5);
  s.writeS32(9, 20);
  s.writeS32(11, 2400);
  s.writeBool(12, false);
  s.writeBool(13, false);
  s.writeBool(14, true);
  s.writeBool(15, false);
  s.writeBool(16, false);
  s.writeString(18, "DSD test");
  s.writeBool(19, false);
  s.writeString(20, "default");
  s.writeS32(21, 6);
  s.writeS32(22, 100);
  s.writeS32(23, 200);
  return s.final();
}

QByteArray udpsrc_blob() {
  // udpsrcsettings.cpp:70-100 (serialize): offset 42000, format USB (5),
  // outputRate 48 kHz, rfBW 3000, gain 1.5, audio on, fmDev 2500,
  // squelch -50 dB, agc on
  SimpleSerializer s(1);
  s.writeS32(2, 42000);
  s.writeS32(3, 5);        // FormatUSB
  s.writeReal(4, 48000.0f);
  s.writeReal(5, 3000.0f);
  s.writeS32(8, 15);       // m_gain*10
  s.writeU32(9, 0xC0C0C0);
  s.writeBool(11, true);   // m_audioActive
  s.writeS32(12, 20);      // m_volume
  s.writeBool(14, false);  // m_audioStereo
  s.writeS32(15, 2500);    // m_fmDeviation
  s.writeS32(16, -50);     // m_squelchdB
  s.writeS32(17, 5);       // m_squelchGate
  s.writeBool(18, true);   // m_agc
  s.writeString(19, "UDP test");
  s.writeString(20, "127.0.0.1");
  s.writeU32(21, 9999);
  s.writeU32(22, 9998);
  return s.final();
}

QByteArray rtlsdr_device_blob() {
  // rtlsdrsettings.cpp:45-66 (serialize): gain 496, ppm 2, log2Decim 5,
  // dcBlock on, iqImbalance off, fcPos CENTER (2), rate 1024000
  SimpleSerializer s(1);
  s.writeS32(2, 496);
  s.writeS32(3, 2);
  s.writeU32(4, 5);
  s.writeBool(5, true);
  s.writeBool(6, false);
  s.writeS32(7, 2);
  s.writeS32(8, 1024000);
  s.writeBool(9, false);
  s.writeBool(10, false);
  s.writeBool(11, false);
  s.writeBool(12, false);
  s.writeS64(13, 0);
  s.writeU32(14, 250000);
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

namespace {

int b64val(char c) {
  if (c >= 'A' && c <= 'Z') return c - 'A';
  if (c >= 'a' && c <= 'z') return c - 'a' + 26;
  if (c >= '0' && c <= '9') return c - '0' + 52;
  if (c == '+') return 62;
  if (c == '/') return 63;
  return -1;
}

QByteArray b64decode(const std::string& s) {
  std::string out;
  int acc = 0, nbits = 0;
  for (char c : s) {
    int v = b64val(c);
    if (v < 0) continue;
    acc = (acc << 6) | v;
    nbits += 6;
    if (nbits >= 8) {
      nbits -= 8;
      out.push_back((char)((acc >> nbits) & 0xFF));
    }
  }
  return QByteArray(out.data(), (int)out.size());
}

// --verify <b64file>: parse a blob (e.g. produced by the PYTHON exporter
// runtime/refpreset.to_reference_preset) with the reference's OWN
// SimpleDeserializer and print what the reference would read — the
// round-trip evidence for the export path (pinned in
// tests/goldens/refpreset_export_verify.txt).
int verify_blob(const char* path) {
  FILE* f = fopen(path, "r");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); return 1; }
  std::string b64;
  char c;
  while (fread(&c, 1, 1, f) == 1) b64.push_back(c);
  fclose(f);
  SimpleDeserializer d(b64decode(b64));
  if (!d.isValid()) { printf("INVALID\n"); return 1; }
  QString str;
  quint64 u64v = 0;
  qint32 s32v = 0;
  bool bv = false;
  d.readString(1, &str); printf("group=%s\n", str.str().c_str());
  d.readString(2, &str); printf("description=%s\n", str.str().c_str());
  d.readU64(3, &u64v); printf("centerFrequency=%llu\n",
                              (unsigned long long)u64v);
  d.readBool(6, &bv); printf("sourcePreset=%d\n", bv ? 1 : 0);
  d.readS32(200, &s32v);
  int n_chan = s32v;
  printf("channels=%d\n", n_chan);
  for (int i = 0; i < n_chan; i++) {
    d.readString(201 + 2 * i, &str);
    QByteArray cfg;
    d.readBlob(202 + 2 * i, &cfg);
    printf("channel[%d] uri=%s\n", i, str.str().c_str());
    SimpleDeserializer cd(cfg);
    if (!cd.isValid()) { printf("  INVALID BLOB\n"); continue; }
    // print the raw stored fields the way the per-kind deserialize()
    // would read them (ids 1..15, S32/bool)
    for (int id = 1; id <= 15; id++) {
      qint32 v;
      if (cd.readS32(id, &v, -99999) && v != -99999) {
        printf("  s32[%d]=%d\n", id, v);
      }
      bool b;
      if (cd.readBool(id, &b, false) && b) {
        printf("  bool[%d]=1\n", id);
      }
    }
  }
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc >= 3 && std::string(argv[1]) == "--verify") {
    return verify_blob(argv[2]);
  }
  if (argc < 2) {
    fprintf(stderr, "usage: %s <output-dir> | --verify <b64file>\n", argv[0]);
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
  s.writeS32(20, 1);     // one device config (rtlsdr layout, r5)
  s.writeString(24, "sdrangel.samplesource.rtlsdr");
  s.writeString(25, "00000001");
  s.writeS32(26, 0);
  s.writeBlob(27, rtlsdr_device_blob());
  s.writeS32(200, 7);  // seven channels (r5: + bfm, dsd, udpsrc)
  QByteArray blobs[7] = {nfm_blob(), am_blob(), ssb_blob(), wfm_blob(),
                         bfm_blob(), dsd_blob(), udpsrc_blob()};
  const char* uris[7] = {
      "sdrangel.channel.nfmdemod", "sdrangel.channel.amdemod",
      "sdrangel.channel.ssbdemod", "sdrangel.channel.wfmdemod",
      "sdrangel.channel.bfm", "sdrangel.channel.dsddemod",
      "sdrangel.channel.udpsrc"};
  for (int i = 0; i < 7; i++) {
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
