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
