"""True multi-process mesh test: two jax.distributed processes (the 2-host
analog — SURVEY.md §4 "multi-node without a cluster") run the sharded
pipeline over one global 8-device mesh with per-process mmap file feeding,
and their outputs match the single-process run exactly."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from sdrangel_tpu.io import sdriq, testsource


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh_matches_single(tmp_path):
    block, n_blocks = 1 << 15, 2
    rate = 768_000.0
    src = testsource.TestSourceConfig(
        sample_rate=rate, carrier_freq=20_000.0, modulation="fm",
        tone_freq=900.0, fm_deviation=5000.0, amplitude=0.4,
    )
    iq = testsource.generate(src, block * n_blocks)
    raw = np.empty((len(iq), 2), np.int16)
    raw[:, 0] = np.clip(iq.real * 32768, -32768, 32767)
    raw[:, 1] = np.clip(iq.imag * 32768, -32768, 32767)
    cap = str(tmp_path / "cap.sdriq")
    sdriq.write(cap, raw, sample_rate=int(rate))

    out = str(tmp_path / "mh")
    port = _free_port()
    worker = os.path.join(REPO, "tools", "multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--process-id", str(i),
             "--num-processes", "2", "--coordinator", f"127.0.0.1:{port}",
             "--capture", cap, "--out", out, "--blocks", str(n_blocks)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-3000:]}"

    # combine both processes' channel rows
    audio = {}
    for i in range(2):
        rows = np.load(os.path.join(out, f"rows_p{i}.npy"))
        data = np.load(os.path.join(out, f"audio_p{i}.npy"))
        for r, d in zip(rows, data):
            audio[int(r)] = d
    assert sorted(audio) == list(range(8)), sorted(audio)

    # single-process oracle on the virtual 8-device mesh (conftest set it up)
    import jax
    import jax.numpy as jnp

    from sdrangel_tpu.parallel import sharded
    from sdrangel_tpu.parallel.hostfeed import ShardedSdriqFeeder

    cfg = sharded.ShardedPipelineConfig(
        n_time=4, n_channel=2, log2_decim=3, block=block, n_channels=8,
    )
    mesh = sharded.make_mesh(4, 2, jax.devices())
    step, init_fn = sharded.build_sharded_step(cfg, mesh)
    state, carry = init_fn()
    feeder = ShardedSdriqFeeder(cap, mesh, block)
    offsets = jnp.full(8, 20_000.0, jnp.float32)
    ref_blocks = []
    for b in range(n_blocks):
        state, a, carry = step(state, feeder.block(b), carry, offsets)
        ref_blocks.append(np.asarray(a))
    ref = np.concatenate(ref_blocks, axis=-1)

    for c in range(8):
        # small wobble allowed: Gloo multi-process collectives reduce in a
        # different order than the single-process backend
        np.testing.assert_allclose(audio[c], ref[c], atol=2e-4)
    assert np.abs(ref).max() > 0.01  # non-vacuous


@pytest.mark.slow
def test_two_process_session_matches_single(tmp_path):
    """Session-driven variant (VERDICT r1 #8): two jax.distributed processes
    each run a Session with a sharded filesource device set; their published
    per-channel audio matches the single-process sharded oracle."""
    block, n_blocks = 1 << 15, 2
    rate = 768_000.0
    src = testsource.TestSourceConfig(
        sample_rate=rate, carrier_freq=20_000.0, modulation="fm",
        tone_freq=900.0, fm_deviation=5000.0, amplitude=0.4,
    )
    iq = testsource.generate(src, block * n_blocks)
    raw = np.empty((len(iq), 2), np.int16)
    raw[:, 0] = np.clip(iq.real * 32768, -32768, 32767)
    raw[:, 1] = np.clip(iq.imag * 32768, -32768, 32767)
    cap = str(tmp_path / "cap.sdriq")
    sdriq.write(cap, raw, sample_rate=int(rate))

    out = str(tmp_path / "mhs")
    port = _free_port()
    worker = os.path.join(REPO, "tools", "multihost_session_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--process-id", str(i),
             "--num-processes", "2", "--coordinator", f"127.0.0.1:{port}",
             "--capture", cap, "--out", out, "--blocks", str(n_blocks)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-3000:]}"

    audio = {}
    for i in range(2):
        rows = np.load(os.path.join(out, f"rows_p{i}.npy"))
        data = np.load(os.path.join(out, f"audio_p{i}.npy"))
        for r, d in zip(rows, data):
            audio[int(r)] = d
    assert sorted(audio) == list(range(8)), sorted(audio)

    import jax
    import jax.numpy as jnp

    from sdrangel_tpu.parallel import sharded
    from sdrangel_tpu.parallel.hostfeed import ShardedSdriqFeeder

    cfg = sharded.ShardedPipelineConfig(
        n_time=4, n_channel=2, log2_decim=3, block=block, device_rate=rate,
        bank=(sharded.BankGroup("sdrangel.channel.nfmdemod", 8,
                                {"squelch_db": -100.0,
                                 "squelch_gate_ms": 1.0}),),
    )
    mesh = sharded.make_mesh(4, 2, jax.devices())
    step, init_fn = sharded.build_sharded_step(cfg, mesh)
    state, carry = init_fn()
    feeder = ShardedSdriqFeeder(cap, mesh, block)
    offsets = jnp.full(8, 20_000.0, jnp.float32)
    ref_blocks = []
    for b in range(n_blocks):
        state, a, carry = step(state, feeder.block(b), carry, offsets)
        ref_blocks.append(np.asarray(a))
    ref = np.concatenate(ref_blocks, axis=-1)

    for c in range(8):
        np.testing.assert_allclose(audio[c], ref[c], atol=2e-4)
    assert np.abs(ref).max() > 0.01
