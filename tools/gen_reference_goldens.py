#!/usr/bin/env python3
"""Build and run the reference-code golden generator.

Compiles native/ref_golden_gen.cc together with the ACTUAL reference DSP
sources from /root/reference/sdrbase (behind the native/qtshim/QtGlobal
typedef shim — the only non-reference code in the binary besides the driver)
and regenerates tests/goldens/.

The goldens are checked into git so the test suite never needs the reference
tree or a compiler; re-run this tool only to extend or audit the set.

Usage: python tools/gen_reference_goldens.py [output_dir]
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path("/root/reference")

REF_SOURCES = [
    "sdrbase/dsp/nco.cpp",
    "sdrbase/dsp/interpolator.cpp",
    "sdrbase/dsp/fftfilt.cpp",
    "sdrbase/dsp/hbfiltertraits.cpp",
    "sdrbase/dsp/ctcssdetector.cpp",
    "sdrbase/dsp/afsquelch.cpp",
    "sdrbase/dsp/decimatorsif.cpp",
    "sdrbase/dsp/decimatorsfi.cpp",
    "sdrbase/dsp/decimatorsff.cpp",
    "sdrbase/dsp/ncof.cpp",
    "sdrbase/dsp/agc.cpp",
    "sdrbase/util/db.cpp",
    "sdrbase/dsp/phaselock.cpp",
    "sdrbase/dsp/filterrc.cpp",
    "sdrbase/dsp/phaselockcomplex.cpp",
]


def main() -> int:
    out_dir = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "tests" / "goldens"
    out_dir.mkdir(parents=True, exist_ok=True)
    if not REF.is_dir():
        print("reference tree not found at /root/reference", file=sys.stderr)
        return 1

    with tempfile.TemporaryDirectory() as td:
        binary = pathlib.Path(td) / "ref_golden_gen"
        cmd = [
            "g++", "-O2", "-std=c++14", "-Dsdrangel_STATIC",
            "-I", str(REPO / "native" / "qtshim"),
            "-I", str(REF / "sdrbase"),
            "-I", str(REF / "exports"),
            str(REPO / "native" / "ref_golden_gen.cc"),
            str(REPO / "native" / "ref_golden_gen_u.cc"),
            str(REPO / "native" / "ref_golden_gen_tx.cc"),
            *[str(REF / s) for s in REF_SOURCES],
            "-o", str(binary),
        ]
        print(" ".join(cmd))
        subprocess.run(cmd, check=True)
        subprocess.run([str(binary), str(out_dir)], check=True)

        # reference-preset TLV test vector: built with the reference's OWN
        # SimpleSerializer (util/simpleserializer.cpp) behind the
        # QString/QByteArray/QMap shims
        pbinary = pathlib.Path(td) / "ref_preset_gen"
        pcmd = [
            "g++", "-O2", "-std=c++14", "-Dsdrangel_STATIC",
            "-I", str(REPO / "native" / "qtshim"),
            "-I", str(REF / "sdrbase"),
            "-I", str(REF / "exports"),
            str(REPO / "native" / "ref_preset_gen.cc"),
            str(REF / "sdrbase" / "util" / "simpleserializer.cpp"),
            "-o", str(pbinary),
        ]
        print(" ".join(pcmd))
        subprocess.run(pcmd, check=True)
        subprocess.run([str(pbinary), str(out_dir)], check=True)

        # export-path evidence: a blob from the PYTHON exporter
        # (runtime/refpreset.to_reference_preset) parsed by the reference's
        # OWN SimpleDeserializer (--verify); the transcript is pinned by
        # tests/test_refpreset.py.
        sys.path.insert(0, str(REPO))
        from sdrangel_tpu.runtime import refpreset

        doc = {
            "group": "ExportGroup", "name": "Export test",
            "deviceSets": [{
                "direction": "rx",
                "source": {"center_frequency": 446_006_250.0},
                "channels": [
                    {"uri": "sdrangel.channel.nfmdemod",
                     "inputFrequencyOffset": -12500.0,
                     "settings": {"rf_bandwidth": 12500.0,
                                  "af_bandwidth": 3000.0, "volume": 1.0,
                                  "squelch_db": -50.0, "ctcss_on": True,
                                  "ctcss_index": 2,
                                  "squelch_gate_ms": 50.0}},
                    {"uri": "sdrangel.channel.ssbdemod",
                     "inputFrequencyOffset": 3000.0,
                     "settings": {"bandwidth": 2700.0, "low_cutoff": 300.0,
                                  "usb": False, "volume": 1.5,
                                  "agc_enable": True}},
                ],
            }],
        }
        import base64

        blob_path = pathlib.Path(td) / "export.b64"
        blob_path.write_text(
            base64.b64encode(refpreset.to_reference_preset(doc)).decode())
        out = subprocess.run([str(pbinary), "--verify", str(blob_path)],
                             check=True, capture_output=True, text=True)
        (out_dir / "refpreset_export_verify.txt").write_text(out.stdout)
        print("export verify transcript:")
        print(out.stdout)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
