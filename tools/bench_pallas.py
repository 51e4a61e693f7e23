"""Back-to-back Pallas fused decimator vs XLA flat conv on real TPU.

Round-1 parked the Pallas kernel at ~1 GS/s — measured BEFORE the
dispatch-poisoning fix (verify SKILL.md round-2 gotchas), so re-measure
both paths in one healthy process. No closed-over device arrays.
"""
import os, sys, time
import numpy as np
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
import jax.numpy as jnp

from sdrangel_tpu.dsp import decimators as dec
from sdrangel_tpu.pallas import decimator as pk

log2 = 6
block = 1 << int(os.environ.get("L2", "23"))
tile_out = int(os.environ.get("TILE", "2048"))
rng = np.random.default_rng(7)
raw_ext = jnp.asarray(
    rng.integers(-2048, 2048, size=(block + pk.HALO, 2), dtype=np.int16))
raw = jnp.asarray(rng.integers(-2048, 2048, size=(block, 2), dtype=np.int16))
casc0 = jax.jit(lambda: dec.init_flat_state(log2))()


@jax.jit
def xla_flat(casc, raw):
    x = raw.astype(jnp.float32) * (1.0 / 32768.0)
    x = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
    casc, bb = dec.decimate_flat_any(casc, x, log2, "cen")
    return casc, jnp.stack([jnp.real(bb), jnp.imag(bb)])


def pallas_fused(raw_ext):
    return pk.decimate_cascade_fused(raw_ext, log2_decim=log2,
                                     tile_out=tile_out)


def pallas_mxu(raw_ext):
    return pk.decimate_cascade_fused_mxu(
        raw_ext, log2_decim=log2,
        tile_out=int(__import__("os").environ.get("TILE_MXU", "2048")))


def timeit(f, *a, iters=30):
    out = f(*a)
    jax.tree_util.tree_leaves(out)[-1].block_until_ready()
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        jax.tree_util.tree_leaves(out)[-1].block_until_ready()
        rates.append(block * iters / (time.perf_counter() - t0))
    return float(np.median(rates))


print("compiling pallas...", flush=True)
r_pallas = timeit(pallas_fused, raw_ext)
print(f"pallas fused : {r_pallas/1e9:7.2f} GS/s (tile_out={tile_out})", flush=True)
print("compiling xla...", flush=True)
r_xla = timeit(xla_flat, casc0, raw)
print(f"xla flat conv: {r_xla/1e9:7.2f} GS/s", flush=True)
# re-measure pallas after xla to expose any ordering effect
r_pallas2 = timeit(pallas_fused, raw_ext)
print(f"pallas again : {r_pallas2/1e9:7.2f} GS/s", flush=True)
print("compiling pallas mxu...", flush=True)
r_mxu = timeit(pallas_mxu, raw_ext)
print(f"pallas MXU   : {r_mxu/1e9:7.2f} GS/s", flush=True)
