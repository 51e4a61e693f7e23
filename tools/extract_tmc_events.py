"""Regenerate sdrangel_tpu/channels/rdstmc_events.py from the reference's
vendored copy of the ISO 14819-2 event table.

The table is CEN standard data (ISO 14819-2 Table 2, §3.1.3), not program
logic — the same category as the half-band coefficient tables in
dsp/hbfilter.py: values that must match exactly for display parity. The
reference stores it as a 2048-row x 4-column char* array indexed by "event
list line" plus a second (code -> line) lookup table
(plugins/channelrx/demodbfm/rdstmc.cpp:30-2079, 1628-3677); we re-key the
data directly by event code, which removes the second table entirely.

Usage: python tools/extract_tmc_events.py [path-to-rdstmc.cpp]
"""

import re
import sys

SRC = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/plugins/channelrx/demodbfm/rdstmc.cpp"
OUT = "sdrangel_tpu/channels/rdstmc_events.py"

ROW = re.compile(r'^\s*\{"(\d+)","((?:[^"\\]|\\.)*)","([^"]*)","([^"]*)"\}')

events = {}
with open(SRC, encoding="utf-8", errors="replace") as f:
    for line in f:
        m = ROW.match(line)
        if not m:
            continue
        _, text, code_s, quant_s = m.groups()
        text = text.replace('\\"', '"').strip()
        code_s = code_s.strip()
        if not text or not code_s:
            continue  # placeholder row
        code = int(code_s)
        quant = int(quant_s) if quant_s.strip() else None
        # keep the first (list-line-ordered) definition of a code
        events.setdefault(code, (text, quant))

with open(OUT, "w", encoding="utf-8") as f:
    f.write('"""ISO 14819-2 Table 2 (RDS-TMC ALERT-C event list, CEN-English).\n'
            '\n'
            'Standard data, keyed by event code -> (text, quantifier type or\n'
            'None). Quantifier types 0-5 ride the 5-bit free-format field,\n'
            '6-12 the 8-bit field (ISO 14819-2 Table 1 §3.1.2). Values\n'
            'transcribed from the reference\'s vendored copy of the standard\n'
            '(plugins/channelrx/demodbfm/rdstmc.cpp:30-2079) so event display\n'
            'text matches for parity; regenerate with\n'
            'tools/extract_tmc_events.py.\n'
            '"""\n\n'
            'EVENTS = {\n')
    for code in sorted(events):
        text, quant = events[code]
        f.write(f"    {code}: ({text!r}, {quant!r}),\n")
    f.write('}\n')

print(f"wrote {len(events)} event codes to {OUT}")
