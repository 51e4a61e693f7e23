"""A/B: 64-channel uniform bank — HB tree bank vs polyphase DFT bank."""
import time, numpy as np, jax, jax.numpy as jnp
from sdrangel_tpu.dsp import channelizer as chanmod
from sdrangel_tpu.dsp import pfb as pfbmod

T = 1 << 21  # baseband samples per block
M = 64
bb_rate = 12_288_000.0
rng = np.random.default_rng(0)
x = rng.standard_normal((2, T)).astype(np.float32)

offsets = (np.where(np.arange(M) <= M//2, np.arange(M), np.arange(M)-M)
           * bb_rate / M)
plans = [chanmod.plan_channel(bb_rate, bb_rate/M/1.5, o) for o in offsets]
depth = len(plans[0].signs)
signs = np.array([p.signs for p in plans if len(p.signs) == depth])
print("tree depth:", depth, "channels with that depth:", signs.shape[0], flush=True)

def tree(cst, xr):
    xc = (xr[0] + 1j*xr[1]).astype(jnp.complex64)
    cst, y = chanmod.channelize_bank_unique(cst, xc, signs)
    return cst, jnp.stack([jnp.real(y).sum(0), jnp.imag(y).sum(0)])

def pfb(pst, xr):
    xc = (xr[0] + 1j*xr[1]).astype(jnp.complex64)
    pst, y = pfbmod.analyze(pst, xc, M)
    return pst, jnp.stack([jnp.real(y).sum(-1), jnp.imag(y).sum(-1)])

for name, fn, st0 in (
    ("tree", jax.jit(tree), jax.jit(lambda: chanmod.init_state(depth, batch_shape=(chanmod.unique_paths(signs),)))()),
    ("pfb",  jax.jit(pfb),  jax.jit(lambda: pfbmod.make_state(M))()),
):
    xd = jnp.asarray(x)
    st, out = fn(st0, xd); out.block_until_ready()
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(20):
            st, out = fn(st, xd)
        out.block_until_ready()
        rates.append(T*20/(time.perf_counter()-t0)/1e9)
    print(f"{name}: {np.median(rates):.1f} GS/s (baseband)", flush=True)
