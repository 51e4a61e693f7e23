"""RDS-TMC (ALERT-C) decode: single-group, multi-group assembly with
free-format fields, duration/quantifier texts (VERDICT r1 #9; reference
rdsparser.cpp decode_type8 + rdstmc.cpp event table)."""

from sdrangel_tpu.channels import rds, rdstmc


def _g8(b1_low, b2, b3):
    """An 8A group with PI 0x1234."""
    return [0x1234, (8 << 12) | b1_low, b2, b3]


def test_single_group_duration_and_event_text():
    dec = rds.RDSDecoder()
    # F=1 single group, dp=3 ("1 hour"), diversion, -direction, extent 4,
    # event 501 roadworks, location 0x0C21
    b2 = (1 << 15) | (1 << 14) | (4 << 11) | 501
    dec.parse_group(_g8((1 << 3) | 3, b2, 0x0C21))
    ev = dec.status.tmc_events[-1]
    assert ev["single_group"] and ev["duration"] == 3
    assert ev["duration_text"] == "1 hour"
    assert ev["direction"] == 1 and ev["extent"] == 4
    # 501 per the full ISO 14819-2 table (rdstmc.cpp:586 row 555)
    assert ev["event"] == 501 and ev["event_text"] == "(Q) right lane(s) closed"
    assert ev["location"] == 0x0C21 and ev["complete"]


def test_multi_group_free_format_fields():
    """First group (D=1, F=0) + two free-format groups: the optional
    content parses into labelled values (ISO 14819-1 §5.5) — the length
    field, a speed limit, and a supplementary info code."""
    dec = rds.RDSDecoder()
    ci = 5
    # first group: event 108 queuing traffic, extent 1, location 0xBEEF
    b2 = (1 << 15) | (0 << 14) | (1 << 11) | 108
    dec.parse_group(_g8(ci, b2, 0xBEEF))
    assert dec.status.tmc_events == []  # incomplete: waiting for groups

    # free-format payload: label 2 (length_km, 5 bits) = 10,
    # label 3 (speed_limit, 5 bits) = 12 (-> 60 km/h),
    # label 6 (supplementary info, 8 bits) = 4; then zero padding.
    bits = 0
    nbits = 0
    for label, value in [(2, 10), (3, 12), (6, 4)]:
        length = rdstmc.LABEL_LENGTHS[label]
        bits = (bits << 4) | label
        bits = (bits << length) | value
        nbits += 4 + length
    total = 2 * 28
    bits <<= total - nbits  # left-align over two 28-bit words
    w1 = (bits >> 28) & 0x0FFFFFFF
    w0 = bits & 0x0FFFFFFF

    # second group: SG=1, gsi=1 (one more follows)
    dec.parse_group(_g8(ci, (0 << 15) | (1 << 14) | (1 << 12) | (w1 >> 16),
                        w1 & 0xFFFF))
    assert dec.status.tmc_events == []
    # last group: gsi=0
    dec.parse_group(_g8(ci, (0 << 15) | (0 << 14) | (0 << 12) | (w0 >> 16),
                        w0 & 0xFFFF))
    ev = dec.status.tmc_events[-1]
    assert not ev["single_group"] and ev["event"] == 108
    assert ev["complete"]
    got = {f["name"]: f for f in ev["fields"]}
    assert got["length_km"]["value"] == 10
    assert got["length_km"]["text"] == "10 km"
    assert got["speed_limit"]["text"] == "60 km/h"
    assert got["supplementary_info"]["value"] == 4


def test_multi_group_interrupted_by_other_ci_is_dropped():
    dec = rds.RDSDecoder()
    b2 = (1 << 15) | (0 << 14) | (1 << 11) | 201
    dec.parse_group(_g8(2, b2, 0x1111))  # first group, ci=2
    # continuation with a DIFFERENT ci: ignored
    dec.parse_group(_g8(7, (1 << 14) | (1 << 12) | 0x5, 0x5555))
    assert dec.status.tmc_events == []
    # completing group for ci=2
    dec.parse_group(_g8(2, (0 << 14) | (0 << 12) | 0x0, 0x0000))
    ev = dec.status.tmc_events[-1]
    assert ev["event"] == 201


def test_tuning_info_produces_no_event():
    dec = rds.RDSDecoder()
    dec.parse_group(_g8((1 << 4) | 6, 0xABCD, 0x1234))  # T=1 variant 6
    assert dec.status.tmc_events == []


def test_event_text_fallback():
    assert rdstmc.event_text(201) == "(Q) accident(s)"
    assert rdstmc.event_text(1999) == "event 1999"
    # quantified render of an 8-bit-field type (type 8 = tonnes)
    assert rdstmc.event_text(404, 12) == \
        "no through traffic for heavy lorries (over Q=12 [W tonnes])"


def test_full_event_table_coverage():
    """The full ISO 14819-2 Table 2 is loaded (1402 coded rows; reference
    vendors 2048 list lines incl. placeholders, rdstmc.cpp:30-2079)."""
    from sdrangel_tpu.channels.rdstmc_events import EVENTS
    assert len(EVENTS) > 1350
    # spot checks across the class range
    assert EVENTS[701][0] == "(Q sets of) roadworks" and EVENTS[701][1] == 0
    assert EVENTS[2000][0].startswith("closed due to smog alert")
    assert EVENTS[1301] == ("dense fog (visibility reduced to Q)", 2)
    # every quantifier type index is within the 13-row type table
    assert all(q is None or 0 <= q < len(rdstmc.QUANT_TYPES)
               for _, q in EVENTS.values())


def test_start_stop_time_quantifier_format():
    assert rdstmc.format_quantifier(7, 4 * 9 + 2) == "09:30"
    assert rdstmc.format_quantifier(8, 96 + 26) == "day +1, 02:00"
    assert rdstmc.format_quantifier(7, 201) == "day 1 of the month"


def test_quantifier_substitutes_into_event_text():
    """A multi-group message carrying a quantifier field (label 4) re-renders
    the event text with Q substituted and the ISO 14819-2 type description
    (the reference stores the type column but never renders values)."""
    dec = rds.RDSDecoder()
    ci = 2
    # first group: event 108 "queuing traffic (with average speeds Q)"
    b2 = (1 << 15) | (0 << 14) | (1 << 11) | 108
    dec.parse_group(_g8(ci, b2, 0x1111))

    # one free-format group: label 4 (quantifier_5bit) = 7
    bits = (4 << 5) | 7
    nbits = 4 + 5
    bits <<= 28 - nbits
    # second=1, gsi=0 (last), 12 msb of word + 16 lsb
    b2f = (1 << 14) | (0 << 12) | ((bits >> 16) & 0xFFF)
    dec.parse_group(_g8(ci, b2f, bits & 0xFFFF))
    ev = dec.status.tmc_events[-1]
    assert ev["event"] == 108
    assert "Q=7" in ev["event_text"], ev["event_text"]
    assert "km/h" in ev["event_text"], ev["event_text"]


def test_quantifier_substitutes_all_placeholder_shapes():
    """The ISO table's Q placeholder comes in many shapes; the value must
    land in all of them (a literal-'(Q)' replace missed 238 codes)."""
    # "(Q sets of) roadworks..." (event 52)
    assert "Q=3" in rdstmc.event_text(52, 3)
    # "multi-vehicle accident (involving Q vehicles)" (203)
    t = rdstmc.event_text(203, 4)
    assert "Q=4" in t and "vehicles" in t
    # no standalone Q at all -> appended
    assert rdstmc.event_text(101, 2).endswith("(Q=2)")
    # 'Q' inside a word must NOT be replaced
    from sdrangel_tpu.channels.rdstmc_events import EVENTS
    import re
    for code, (text, qt) in EVENTS.items():
        if qt is not None:
            out = rdstmc.event_text(code, 9)
            assert "Q=9" in out, (code, text, out)
