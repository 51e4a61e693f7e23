"""Synthetic I/Q generator — the golden-test signal source.

Reference: plugins/samplesource/testsource/testsourcethread.cpp:219-266 —
NCO carrier with None/AM/FM modulation by an audio-tone NCO, with controlled
amplitude per rail, DC offset on I, and phase imbalance injected on Q
(im += phaseImbalance*re). Used to exercise the full Rx chain and the
DC/IQ-correction path without hardware (SURVEY.md §4.2).

Host-side NumPy: the generator feeds goldens and benchmarks; it is not a hot
path.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class TestSourceConfig:
    sample_rate: float = 768_000.0
    carrier_freq: float = 0.0  # carrier offset from centre
    modulation: str = "none"  # none | am | fm
    tone_freq: float = 1000.0  # AF tone
    am_depth: float = 0.5  # AM modulation factor (0..1)
    fm_deviation: float = 5000.0  # Hz
    amplitude: float = 0.5  # full-scale fraction
    dc_factor: float = 0.0  # DC offset on I (fraction of full scale)
    i_factor: float = 0.0  # amplitude imbalance: I rail scaled by (1+i_factor)
    phase_imbalance: float = 0.0  # Q' = Q + imb*I


def generate(cfg: TestSourceConfig, n: int, start_sample: int = 0) -> np.ndarray:
    """Generate n complex64 samples (deterministic for any start offset)."""
    t = (start_sample + np.arange(n, dtype=np.float64)) / cfg.sample_rate
    carrier_phase = 2.0 * np.pi * cfg.carrier_freq * t
    af = np.sin(2.0 * np.pi * cfg.tone_freq * t)
    if cfg.modulation == "am":
        env = (af * cfg.am_depth + 1.0) * 0.5
        c = np.exp(1j * carrier_phase) * env
    elif cfg.modulation == "fm":
        # integrated deviation (testsourcethread.cpp fmPhasor accumulation)
        dphase = 2.0 * np.pi * cfg.fm_deviation * (-np.cos(2.0 * np.pi * cfg.tone_freq * t)) / (
            2.0 * np.pi * cfg.tone_freq
        )
        c = np.exp(1j * (carrier_phase + dphase))
    elif cfg.modulation == "none":
        c = np.exp(1j * carrier_phase)
    else:
        raise ValueError(cfg.modulation)
    re = c.real * cfg.amplitude * (1.0 + cfg.i_factor)
    im = c.imag * cfg.amplitude + cfg.phase_imbalance * re
    re = re + cfg.dc_factor * cfg.amplitude
    return (re + 1j * im).astype(np.complex64)
