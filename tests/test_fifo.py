"""BlockFifo — the SampleSourceFifo/SampleSinkFifo role
(sdrbase/dsp/samplesourcefifo.h write-side backpressure semantics)."""

import threading
import time

import numpy as np

from sdrangel_tpu.runtime.fifo import BlockFifo


def test_fifo_order_and_close_drain():
    f = BlockFifo(depth=4)
    for i in range(3):
        assert f.put(np.full(4, i))
    f.close()
    got = []
    while (b := f.get()) is not None:
        got.append(int(b[0]))
    assert got == [0, 1, 2]
    assert f.get() is None  # stays closed
    assert not f.put(np.zeros(1))  # writes after close are refused


def test_fifo_backpressure_blocks_producer():
    f = BlockFifo(depth=2)
    assert f.put(0) and f.put(1)
    t0 = time.perf_counter()
    assert not f.put(2, timeout=0.1)  # full: blocks, then times out
    assert time.perf_counter() - t0 >= 0.1
    assert f.backpressure_waits == 1
    assert f.get() == 0
    assert f.put(2, timeout=0.1)  # space freed
    assert [f.get(), f.get()] == [1, 2]


def test_fifo_producer_consumer_threads():
    f = BlockFifo(depth=3)
    n = 200
    got = []

    def produce():
        for i in range(n):
            assert f.put(i)
        f.close()

    def consume():
        while (b := f.get(timeout=5.0)) is not None:
            got.append(b)
            time.sleep(0.0005)  # slow consumer forces backpressure

    tp = threading.Thread(target=produce)
    tc = threading.Thread(target=consume)
    tc.start(); tp.start()
    tp.join(10.0); tc.join(10.0)
    assert got == list(range(n))
    assert f.backpressure_waits > 0  # the slow sink actually stalled writes
    assert f.blocks_in == f.blocks_out == n


def test_packed_outs_roundtrip():
    """engine._step_packed + unpack_outs: the packed f32 vector rebuilds
    the outs tree exactly (audio f32, power scalar, squelch bool, data
    channel int arrays) — the one-fetch publish contract (r5)."""
    import jax.numpy as jnp
    import numpy as np

    from sdrangel_tpu.io import testsource
    from sdrangel_tpu.runtime.engine import ChannelSpec, DeviceConfig, RxPipeline

    device = DeviceConfig(sample_rate=768_000.0, log2_decim=3)
    pipe = RxPipeline(device, [
        ChannelSpec("sdrangel.channel.nfmdemod", 10_000.0,
                    {"squelch_db": -100.0}),
        ChannelSpec("sdrangel.channel.chanalyzer", -12_000.0, {}),
    ])
    state = pipe.init_state()
    dyn = pipe.default_dyn()
    cfg = testsource.TestSourceConfig(sample_rate=768_000.0,
                                      carrier_freq=10_000.0, modulation="fm")
    c = testsource.generate(cfg, pipe.device_block)
    raw = np.empty((pipe.device_block, 2), np.int16)
    raw[:, 0] = np.clip(c.real * 32768, -32768, 32767)
    raw[:, 1] = np.clip(c.imag * 32768, -32768, 32767)

    _, outs = pipe._step(state, jnp.asarray(raw), dyn)
    pipe._ensure_layout(state, dyn)
    _, flat = pipe._step_packed(state, jnp.asarray(raw), dyn)
    rebuilt = pipe.unpack_outs(np.asarray(flat))

    import jax

    ref_leaves = jax.tree.leaves(outs)
    got_leaves = jax.tree.leaves(rebuilt)
    assert len(ref_leaves) == len(got_leaves)
    for r, g in zip(ref_leaves, got_leaves):
        r = np.asarray(r)
        assert r.shape == np.asarray(g).shape, (r.shape, np.asarray(g).shape)
        if r.dtype == np.bool_:
            assert np.array_equal(r, g)
        elif np.issubdtype(r.dtype, np.floating):
            np.testing.assert_allclose(r, g, rtol=0, atol=0)
        else:
            assert np.asarray(g).dtype == r.dtype
            np.testing.assert_array_equal(r, g)
