import os, sys, time
import numpy as np
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
import jax.numpy as jnp
from sdrangel_tpu.dsp import nco

C, T = 16, 32768
rng = np.random.default_rng(0)
x = jnp.asarray((rng.normal(size=(C, T)) + 1j * rng.normal(size=(C, T))).astype(np.complex64))
res = jnp.asarray(rng.uniform(-24e3, 24e3, C).astype(np.float32))
st = jax.jit(lambda: nco.make_nco((C,)))()


def timeit(f, *a, iters=100):
    out = f(*a)
    jax.tree_util.tree_leaves(out)[-1].block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        jax.tree_util.tree_leaves(out)[-1].block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


@jax.jit
def mix(st, x, res):
    inc = nco.freq_to_increment_traced(-res, 48000.0)
    return nco.mix_block(st, x, inc)

@jax.jit
def just_inc(res):
    return nco.freq_to_increment_traced(-res, 48000.0)

@jax.jit
def just_phasors(st, res):
    inc = nco.freq_to_increment_traced(-res, 48000.0)
    q = jnp.arange(T // 128, dtype=jnp.uint32)
    r = jnp.arange(128, dtype=jnp.uint32)
    pq = st.phase[..., None] + (inc[..., None] * jnp.uint32(128)) * q
    pr = inc[..., None] * r
    return nco._phasor(pq), nco._phasor(pr)

@jax.jit
def outer_only(a, b):
    return (a[..., :, None] * b[..., None, :]).reshape(C, T)

@jax.jit
def mul_only(x, iq):
    return (x * iq).astype(jnp.complex64)

@jax.jit
def mix_f32(st, x, res):
    """float32 angle ramp variant: theta = 2pi*frac(n*f/fs), sin/cos fused."""
    turns = jnp.mod(-res / jnp.float32(48000.0), 1.0)
    nq = jnp.arange(T // 128, dtype=jnp.float32) * 128.0
    nr = jnp.arange(128, dtype=jnp.float32)
    aq = 2 * jnp.pi * jnp.mod(turns[:, None] * nq, 1.0)
    ar = 2 * jnp.pi * jnp.mod(turns[:, None] * nr, 1.0)
    eq = jnp.cos(aq) + 1j * jnp.sin(aq)
    er = jnp.cos(ar) + 1j * jnp.sin(ar)
    iq = (eq[:, :, None] * er[:, None, :]).reshape(C, T)
    return x * iq


pa, pb = just_phasors(st, res)
print("mix_block   ", timeit(mix, st, x, res) * 1e6, "us")
print("inc only    ", timeit(just_inc, res) * 1e6, "us")
print("phasors only", timeit(just_phasors, st, res) * 1e6, "us")
print("outer only  ", timeit(outer_only, pa, pb) * 1e6, "us")
print("mul only    ", timeit(mul_only, x, x) * 1e6, "us")
print("mix f32     ", timeit(mix_f32, st, x, res) * 1e6, "us")
