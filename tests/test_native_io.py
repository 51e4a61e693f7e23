"""Native C++ sdriq loader tests (ctypes) vs the NumPy implementation."""

import os

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
    # read_block's non-wrapping path is now a straight slice+memcpy, which
    # beats a ctypes round trip at these sizes; the native loader earns its
    # keep on conversions and the mmap lifecycle. Same order of magnitude.
    assert t_native < t_numpy * 5 + 1e-3, (t_native, t_numpy)
    f.close()


def test_fixed_point_parity_vs_reference_arithmetic(tmp_path):
    """The float32 cascade matches the reference's exact integer arithmetic
    (Q12 coefficients, int64 accumulate, >>12 per stage — decimators.h /
    inthalfbandfiltereo.h semantics reimplemented in native/ref_cpu_bench.cc)
    to the coefficient-quantization floor (SURVEY.md §7.3 hard part 4)."""
    import subprocess

    import jax.numpy as jnp

    from sdrangel_tpu.dsp import decimators as dec

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(repo, "native", "ref_cpu_bench.cc")
    exe = str(tmp_path / "ref_parity")
    subprocess.run(["g++", "-O3", "-o", exe, src], check=True, capture_output=True)

    rng = np.random.default_rng(42)
    n = 1 << 17
    # band-limited-ish test signal well inside the ÷64 passband
    t = np.arange(n)
    sig = (
        8000.0 * np.exp(1j * 2 * np.pi * 1e-4 * t)
        + 4000.0 * np.exp(1j * (2 * np.pi * 3e-4 * t + 1.0))
        + rng.normal(scale=300.0, size=n) + 1j * rng.normal(scale=300.0, size=n)
    )
    raw = np.empty((n, 2), np.int16)
    raw[:, 0] = np.clip(sig.real, -32768, 32767)
    raw[:, 1] = np.clip(sig.imag, -32768, 32767)
    fin = str(tmp_path / "in.bin")
    fout = str(tmp_path / "out.bin")
    raw.tofile(fin)
    subprocess.run([exe, "--parity", fin, fout], check=True)
    ref = np.fromfile(fout, np.int32).reshape(-1, 2)
    ref_c = (ref[:, 0] + 1j * ref[:, 1]).astype(np.complex128)

    x = jnp.asarray((raw[:, 0] + 1j * raw[:, 1]).astype(np.complex64))
    st = dec.init_flat_state(6)
    _, y = dec.decimate_flat(st, x, 6)
    ours = np.asarray(y).astype(np.complex128)

    m = min(len(ours), len(ref_c))
    # alignment search (integer pipeline emits on its own phase)
    best = (-1e9, 0)
    for lag in range(-3, 4):
        a = ours[max(0, lag):m + min(0, lag)]
        b = ref_c[max(0, -lag):m - max(0, lag)]
        k = min(len(a), len(b))
        if k < 100:
            continue
        a, b = a[50:k], b[50:k]  # skip zero-state warmup
        err = a - b
        snr = 10 * np.log10(
            float(np.mean(np.abs(b) ** 2)) / max(float(np.mean(np.abs(err) ** 2)), 1e-30)
        )
        if snr > best[0]:
            best = (snr, lag)
    assert best[0] > 45.0, f"fixed-point parity SNR {best[0]:.1f} dB (lag {best[1]})"
