"""Conv-precision policy pinning (VERDICT r2 #9).

dsp/decimators.py documents: TPU conv default (bf16) is BELOW the
reference's int16 pipeline; "high" (bf16x3) EXCEEDS int16 fidelity. This
test pins that claim so an XLA upgrade that degrades bf16x3 behavior trips
a regression. Precision is read at import time from
SDRANGEL_TPU_CONV_PRECISION, so each point runs in a subprocess.

The bf16/bf16x3 distinction only exists on TPU hardware — on CPU all three
settings lower to f32 convs, so there the test asserts exactly that
(plumbing sanity); the ordering/fidelity assertions need
SDRANGEL_TPU_TEST_ON_TPU=1 (the driver's hardware pass).
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

import pytest

PROBE = pathlib.Path(__file__).parent.parent / "tools" / "precision_probe.py"

#: int16 quantization SNR for a full-scale sine: 6.02*16 + 1.76 dB
INT16_SNR_DB = 98.1


def _snr(precision: str) -> float:
    env = dict(os.environ, SDRANGEL_TPU_CONV_PRECISION=precision)
    out = subprocess.run([sys.executable, str(PROBE)], env=env,
                         capture_output=True, text=True, check=True,
                         timeout=560)
    return json.loads(out.stdout.strip().splitlines()[-1])["snr_db"]


@pytest.mark.slow
def test_precision_policy():
    on_tpu = bool(os.environ.get("SDRANGEL_TPU_TEST_ON_TPU"))
    snrs = {p: _snr(p) for p in ("default", "high", "highest")}
    if not on_tpu:
        # CPU lowers every precision to f32 — all three must agree and
        # clear the int16 bar (validates the env plumbing + the oracle)
        assert all(s > 90.0 for s in snrs.values()), snrs
        assert max(snrs.values()) - min(snrs.values()) < 3.0, snrs
        return
    # TPU: documented ordering and the ">= int16 fidelity" claim for "high"
    assert snrs["default"] < snrs["high"] - 10.0, snrs  # bf16 clearly below
    assert snrs["high"] > 90.0, snrs  # bf16x3 ~ f32: beats int16-class SNR
    assert snrs["highest"] >= snrs["high"] - 3.0, snrs
