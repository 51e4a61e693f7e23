import os, sys, time
import numpy as np
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
import jax.numpy as jnp
from sdrangel_tpu.dsp import channelizer as chanmod
from sdrangel_tpu.dsp import decimators as dec
from sdrangel_tpu.dsp import nco

log2 = 6
block = 1 << 23
leafT = (block >> log2) >> 2
device_rate = 12_288_000.0
bbr = device_rate / 64
leaf = bbr / 8.0
offsets = np.array([c + j for c in (-3 * leaf, -leaf, leaf, 3 * leaf)
                    for j in (-0.18 * leaf, -0.06 * leaf, 0.06 * leaf, 0.18 * leaf)])
plans = [chanmod.plan_channel(bbr, bbr / 6.0, o) for o in offsets]
signs = np.array([p.signs for p in plans])
residual = jnp.asarray([p.residual_offset for p in plans], jnp.float32)
uniq, inverse = np.unique(signs, axis=0, return_inverse=True)

rng = np.random.default_rng(7)
raw = jnp.asarray(rng.integers(-2048, 2048, size=(block, 2), dtype=np.int16))
casc0 = jax.jit(lambda: dec.init_flat_state(log2))()
cstate0 = jax.jit(lambda: chanmod.init_state(2, batch_shape=(len(uniq),)))()
nst0 = jax.jit(lambda: nco.make_nco((16,)))()


def front(casc, cstate, raw):
    x = raw.astype(jnp.float32) * (1.0 / 32768.0)
    x = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
    casc, bb = dec.decimate_flat_any(casc, x, log2, "cen")
    xb = jnp.broadcast_to(bb, (len(uniq), bb.shape[-1]))
    cstate, y_u = chanmod.channelize_bank(cstate, xb, uniq)
    return casc, cstate, y_u


@jax.jit
def v_n1(casc, cstate, raw):
    casc, cstate, y_u = front(casc, cstate, raw)
    return casc, cstate, y_u[np.asarray(inverse)]

@jax.jit
def v_gather(casc, cstate, nst, raw):
    casc, cstate, y_u = front(casc, cstate, raw)
    y = y_u[np.asarray(inverse)]
    inc = nco.freq_to_increment_traced(-residual, 48000.0)
    nst, xm = nco.mix_block(nst, y, inc)
    return casc, cstate, nst, xm

@jax.jit
def v_onehot(casc, cstate, nst, raw):
    casc, cstate, y_u = front(casc, cstate, raw)
    oh = jnp.asarray(np.eye(len(uniq), dtype=np.float32)[inverse])  # (16, U)
    y = (oh @ y_u.real + 1j * (oh @ y_u.imag)).astype(jnp.complex64)
    inc = nco.freq_to_increment_traced(-residual, 48000.0)
    nst, xm = nco.mix_block(nst, y, inc)
    return casc, cstate, nst, xm

@jax.jit
def v_nogather(casc, cstate, nst, raw):
    casc, cstate, y_u = front(casc, cstate, raw)
    y = jnp.tile(y_u, (4, 1))  # wrong mapping, same shapes
    inc = nco.freq_to_increment_traced(-residual, 48000.0)
    nst, xm = nco.mix_block(nst, y, inc)
    return casc, cstate, nst, xm

@jax.jit
def v_constinc(casc, cstate, nst, raw):
    casc, cstate, y_u = front(casc, cstate, raw)
    y = y_u[np.asarray(inverse)]
    inc = jnp.asarray(nco.freq_to_increment(-np.asarray(residual), 48000.0))
    nst, xm = nco.mix_block(nst, y, inc)
    return casc, cstate, nst, xm


def timeit(f, *a, iters=30):
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


print("n1 (front+gather)", timeit(v_n1, casc0, cstate0, raw) * 1e3, "ms")
print("gather+nco       ", timeit(v_gather, casc0, cstate0, nst0, raw) * 1e3, "ms")
print("onehot+nco       ", timeit(v_onehot, casc0, cstate0, nst0, raw) * 1e3, "ms")
print("tile+nco         ", timeit(v_nogather, casc0, cstate0, nst0, raw) * 1e3, "ms")
print("gather+nco const ", timeit(v_constinc, casc0, cstate0, nst0, raw) * 1e3, "ms")


@jax.jit
def v_barrier(casc, cstate, nst, raw):
    casc, cstate, y_u = front(casc, cstate, raw)
    casc, cstate, y_u = jax.lax.optimization_barrier((casc, cstate, y_u))
    y = y_u[np.asarray(inverse)]
    inc = nco.freq_to_increment_traced(-residual, 48000.0)
    nst, xm = nco.mix_block(nst, y, inc)
    return casc, cstate, nst, xm

@jax.jit
def v_barrier2(casc, cstate, nst, raw):
    casc, cstate, y_u = front(casc, cstate, raw)
    y_u = jax.lax.optimization_barrier(y_u)
    y = y_u[np.asarray(inverse)]
    inc = nco.freq_to_increment_traced(-residual, 48000.0)
    nst, xm = nco.mix_block(nst, y, inc)
    return casc, cstate, nst, xm

print("barrier all      ", timeit(v_barrier, casc0, cstate0, nst0, raw) * 1e3, "ms")
print("barrier y_u      ", timeit(v_barrier2, casc0, cstate0, nst0, raw) * 1e3, "ms")
