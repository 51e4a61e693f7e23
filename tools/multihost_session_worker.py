"""One process of a multi-host SESSION run: the sharded pipeline driven
through the Session/DeviceSet control plane (source.sharded = True) instead
of a bespoke step loop — a distributed launch is a session flag
(VERDICT r1 #8; tools/multihost_worker.py is the raw-step analog).

Each process starts the same session configuration; the device set's
sharded worker feeds only this process's addressable shards
(parallel/hostfeed.py) and publishes only its addressable channels, which
are written to outdir/audio_pI.npy with their channel indices.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--capture", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--n-time", type=int, default=4)
    ap.add_argument("--n-channel", type=int, default=2)
    ap.add_argument("--log2-decim", type=int, default=3)
    ap.add_argument("--block", type=int, default=1 << 15)
    ap.add_argument("--n-channels", type=int, default=8)
    ap.add_argument("--offset-hz", type=float, default=20000.0)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        args.coordinator, num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import numpy as np

    from sdrangel_tpu.runtime.session import Session

    sess = Session()
    ds = sess.add_device_set()
    ds.update_source({
        "kind": "filesource", "file_path": args.capture,
        "log2_decim": args.log2_decim, "sharded": True,
        "mesh_time": args.n_time, "mesh_channel": args.n_channel,
        "sharded_block": args.block, "run_blocks": args.blocks,
    })
    for _ in range(args.n_channels):
        ds.add_channel("sdrangel.channel.nfmdemod", {
            "inputFrequencyOffset": args.offset_hz,
            "squelch_db": -100.0, "squelch_gate_ms": 1.0,
        })
    ds.start()
    # run_blocks ends acquisition itself after exactly --blocks steps, in
    # lockstep across processes (no stop() race inside a collective)
    t0 = time.time()
    while ds.running:
        if ds.error:
            print(f"device set error: {ds.error}", flush=True)
            return 1
        if time.time() - t0 > 300:
            print("timeout waiting for blocks", flush=True)
            return 1
        time.sleep(0.02)
    ds.stop()
    if ds.error:
        print(f"device set error: {ds.error}", flush=True)
        return 1
    assert ds.blocks_processed == args.blocks, ds.blocks_processed

    rows, auds = [], []
    for c in range(args.n_channels):
        a = ds.drain_audio(c)
        if a.size:
            rows.append(c)
            auds.append(a)
    out = np.stack(auds)
    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, f"audio_p{args.process_id}.npy"), out)
    np.save(os.path.join(args.out, f"rows_p{args.process_id}.npy"),
            np.asarray(rows, np.int32))
    print(f"process {args.process_id}: rows {rows} ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
