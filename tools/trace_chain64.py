#!/usr/bin/env python3
"""Capture a JAX profiler trace of the chain64 step on hardware, then print
the per-HLO-op time breakdown from the trace (top fusions by self time).

PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_chain64.py [log2block]
"""

import glob
import gzip
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from sdrangel_tpu.channels import demod_nfm
from sdrangel_tpu.dsp import pfb as pfbmod

LOG2BLOCK = int(sys.argv[1]) if len(sys.argv) > 1 else 22
BLOCK = 1 << LOG2BLOCK
M = 256
C = 64
F = BLOCK // M

cfg = demod_nfm.NFMConfig(channel_rate=48000.0, block_in=F,
                          squelch_db=-100.0, squelch_gate_ms=1.0)
residual = np.linspace(-4000.0, 4000.0, C).astype(np.float32)
chan_sel = np.array([c % M for c in range(-32, 32)], np.int32)


def step(cstate, dstate, raw):
    x = raw.astype(jnp.float32) * (1.0 / 32768.0)
    x = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
    cstate, yall = pfbmod.analyze(cstate, x, M)
    y = jnp.moveaxis(yall[..., jnp.asarray(chan_sel)], -1, 0)
    dstate, audio = demod_nfm.process(dstate, y, cfg, offset_hz=residual)
    return cstate, dstate, audio


def main():
    print("devices:", jax.devices(), flush=True)
    jstep = jax.jit(step)
    rng = np.random.default_rng(7)
    raw = jnp.asarray(rng.integers(-2048, 2048, size=(BLOCK, 2), dtype=np.int16))
    cstate = jax.jit(lambda: pfbmod.make_state(M))()
    dstate = jax.jit(lambda: demod_nfm.make_state(cfg, (C,)))()
    t0 = time.time()
    cstate, dstate, audio = jstep(cstate, dstate, raw)
    audio.block_until_ready()
    print(f"compile+first {time.time()-t0:.1f}s", flush=True)

    trace_dir = "/tmp/chain64_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(20):
            cstate, dstate, audio = jstep(cstate, dstate, raw)
        audio.block_until_ready()
    print("trace captured", flush=True)

    # parse the trace: sum durations per op name on the device track
    paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace file found", flush=True)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        doc = json.load(f)
    events = [e for e in doc.get("traceEvents", []) if e.get("ph") == "X"]
    # find device PIDs (process names containing TPU/device)
    names = {}
    for e in doc.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "/device" in n.lower() or "Chip" in n}
    agg = {}
    total = 0.0
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        dur = float(e.get("dur", 0.0))
        agg[e["name"]] = agg.get(e["name"], 0.0) + dur
        total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    print(f"total device-op time {total/20:.1f} us/step over 20 steps", flush=True)
    for name, dur in top:
        print(f"  {dur/20:9.2f} us/step  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
