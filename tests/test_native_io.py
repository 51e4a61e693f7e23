"""Native C++ sdriq loader tests (ctypes) vs the NumPy implementation."""

import numpy as np
import pytest

from sdrangel_tpu.io import native, sdriq


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nat") / "c.sdriq")
    rng = np.random.default_rng(0)
    iq = (rng.uniform(-0.9, 0.9, 10000) + 1j * rng.uniform(-0.9, 0.9, 10000)).astype(
        np.complex64
    )
    sdriq.write(path, iq, sample_rate=250000, center_frequency=433_000_000)
    return path


def test_native_available():
    assert native.available(), "libsdriq.so failed to build"


def test_native_header(capture):
    f = native.NativeSdriq(capture)
    assert f.sample_rate == 250000
    assert f.center_frequency == 433_000_000
    assert f.sample_size == 16
    assert f.n_samples == 10000
    f.close()


def test_native_matches_numpy(capture):
    f = native.NativeSdriq(capture)
    _, mm = sdriq.open_mmap(capture)
    blk_n = sdriq.read_block(mm, 9990, 30)  # wraps EOF
    blk_c = f.read_i16(9990, 30)
    np.testing.assert_array_equal(blk_n, blk_c)
    f32 = f.read_f32(0, 100)
    np.testing.assert_allclose(
        f32, mm[:100].astype(np.float32) / 32768.0, atol=1e-7
    )
    f.close()


def test_native_throughput(capture):
    """The native reader must beat a per-call numpy fancy-index read."""
    import time

    f = native.NativeSdriq(capture)
    _, mm = sdriq.open_mmap(capture)
    n_iter, count = 200, 8192
    t0 = time.perf_counter()
    for i in range(n_iter):
        f.read_i16(i * count, count)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n_iter):
        sdriq.read_block(mm, i * count, count)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy * 1.5, (t_native, t_numpy)  # at least comparable
    f.close()
