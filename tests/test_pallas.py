"""Pallas fused decimator kernel vs the XLA cascade (interpret mode on CPU;
the same kernel compiles for real TPU via the Mosaic backend)."""

import numpy as np
import pytest

from sdrangel_tpu.pallas import decimator as pk


@pytest.mark.parametrize("log2", [2, 6])
def test_fused_matches_xla(log2):
    rng = np.random.default_rng(5)
    t = 1 << 16
    raw = rng.integers(-8000, 8000, size=(t + pk.HALO, 2), dtype=np.int16)
    out = np.asarray(
        pk.decimate_cascade_fused(raw, log2_decim=log2, tile_out=t >> log2, interpret=True)
    )
    oracle = pk.reference_equivalent(raw, log2)
    assert out.shape == oracle.shape == (2, t >> log2)
    np.testing.assert_allclose(out, oracle, atol=2e-5)


def test_fused_multi_tile():
    rng = np.random.default_rng(6)
    tile = 1 << 14
    t = tile * 4
    raw = rng.integers(-8000, 8000, size=(t + pk.HALO, 2), dtype=np.int16)
    out = np.asarray(
        pk.decimate_cascade_fused(raw, log2_decim=6, tile_out=tile >> 6, interpret=True)
    )
    oracle = pk.reference_equivalent(raw, 6)
    np.testing.assert_allclose(out, oracle, atol=2e-5)


@pytest.mark.parametrize("log2", [2, 6])
def test_fused_mxu_matches_xla(log2):
    """The MXU formulation (per-tap sublane-contracting dots) is exact
    against the same streaming-cascade oracle."""
    rng = np.random.default_rng(7)
    t = 1 << 16
    raw = rng.integers(-8000, 8000, size=(t + pk.HALO, 2), dtype=np.int16)
    out = np.asarray(pk.decimate_cascade_fused_mxu(
        raw, log2_decim=log2, tile_out=t >> log2, interpret=True))
    oracle = pk.reference_equivalent(raw, log2)
    np.testing.assert_allclose(out, oracle, atol=2e-5)


def test_fused_mxu_multi_tile():
    rng = np.random.default_rng(8)
    tile = 1 << 14
    t = tile * 4
    raw = rng.integers(-8000, 8000, size=(t + pk.HALO, 2), dtype=np.int16)
    out = np.asarray(pk.decimate_cascade_fused_mxu(
        raw, log2_decim=6, tile_out=tile >> 6, interpret=True))
    oracle = pk.reference_equivalent(raw, 6)
    np.testing.assert_allclose(out, oracle, atol=2e-5)
