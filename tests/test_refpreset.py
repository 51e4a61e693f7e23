"""Reference preset import (VERDICT r3 missing #5): the Base64-TLV blob in
tests/goldens/refpreset.b64 was produced by the reference's OWN
SimpleSerializer (native/ref_preset_gen.cc links
/root/reference/sdrbase/util/simpleserializer.cpp behind the qtshim), so
the importer is tested against bytes the reference code actually emits."""

import pathlib

import pytest

from sdrangel_tpu.channels import registry
from sdrangel_tpu.runtime import refpreset
from sdrangel_tpu.runtime.session import Session

BLOB = (pathlib.Path(__file__).parent / "goldens" / "refpreset.b64").read_text()


def test_parse_reference_preset_blob():
    p = refpreset.parse_preset(BLOB)
    assert p["group"] == "TestGroup"
    assert p["description"] == "Imported reference preset"
    assert p["centerFrequency"] == 145_500_000
    assert p["sourcePreset"] is True
    uris = [c["uri"] for c in p["channels"]]
    assert uris == ["sdrangel.channel.nfmdemod", "sdrangel.channel.amdemod",
                    "sdrangel.channel.ssbdemod", "sdrangel.channel.wfmdemod"]
    nfm = p["channels"][0]["settings"]
    # nfmdemodsettings.cpp deserialize scalings: rfBW index 4 -> 12500 Hz
    # with paired deviation 5000; afBW x1000; volume /10; squelch
    # centibels -> dB; gate x10 ms
    assert nfm == {
        "inputFrequencyOffset": 12500.0, "rf_bandwidth": 12500.0,
        "fm_deviation": 5000.0, "af_bandwidth": 4000.0, "volume": 2.0,
        "squelch_db": -40.0, "ctcss_index": 3, "ctcss_on": True,
        "audio_mute": False, "squelch_gate_ms": 70.0,
    }
    am = p["channels"][1]["settings"]
    assert am["rf_bandwidth"] == 5000.0 and am["squelch_db"] == -35.0
    assert am["inputFrequencyOffset"] == -7000.0 and am["bandpass_enable"]
    ssb = p["channels"][2]["settings"]
    assert ssb["bandwidth"] == 2800.0 and ssb["low_cutoff"] == 200.0
    assert ssb["agc_enable"] is True and ssb["usb"] is True
    wfm = p["channels"][3]["settings"]
    assert wfm["rf_bandwidth"] == 180000.0 and wfm["af_bandwidth"] == 15000.0


def test_mapped_settings_validate_against_registry():
    p = refpreset.parse_preset(BLOB)
    for ch in p["channels"]:
        st = dict(ch["settings"])
        st.pop("inputFrequencyOffset", None)
        registry.validate_settings(ch["uri"], st)  # raises on unknown/bad


def test_import_into_session(tmp_path):
    path = tmp_path / "ref.prex"
    path.write_text(BLOB)
    sess = Session(preset_path=str(tmp_path / "presets.json"),
                   preset_dir=str(tmp_path))
    key = sess.import_preset_file(str(path))
    assert key == "TestGroup/Imported reference preset"
    sess.load_preset("TestGroup", "Imported reference preset")
    assert len(sess.device_sets) == 1
    ds = sess.device_sets[0]
    assert [ch.uri for ch in ds.channels] == [
        "sdrangel.channel.nfmdemod", "sdrangel.channel.amdemod",
        "sdrangel.channel.ssbdemod", "sdrangel.channel.wfmdemod"]
    assert ds.channels[0].frequency_offset == 12500.0
    assert ds.channels[0].settings["squelch_db"] == -40.0
    assert ds.source.center_frequency == 145_500_000.0


def test_reject_garbage():
    with pytest.raises(ValueError):
        refpreset.parse_preset(b"\x00\x01\x02garbage")
