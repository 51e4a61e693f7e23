import os, sys
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
bbr = 12_288_000.0 / 64
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


def v_gather(casc, cstate, nst, raw):
    x = raw.astype(jnp.float32) * (1.0 / 32768.0)
    x = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
    casc, bb = dec.decimate_flat_any(casc, x, log2, "cen")
    xb = jnp.broadcast_to(bb, (len(uniq), bb.shape[-1]))
    cstate, y_u = chanmod.channelize_bank(cstate, xb, uniq)
    y = y_u[np.asarray(inverse)]
    inc = nco.freq_to_increment_traced(-residual, 48000.0)
    nst, xm = nco.mix_block(nst, y, inc)
    return casc, cstate, nst, xm


lowered = jax.jit(v_gather).lower(casc0, cstate0, nst0, raw)
comp = lowered.compile()
txt = comp.as_text()
with open("/tmp/hlo_gather.txt", "w") as f:
    f.write(txt)
import re
print("total lines", len(txt.splitlines()))
# find the fusion kernels and their shapes
for m in re.finditer(r"^\s*ENTRY.*$|^fused_computation.*$|^%?fusion.*$", txt, re.M):
    pass
ops = {}
for line in txt.splitlines():
    m = re.search(r"= (\w+)\(", line)
    if m:
        ops[m.group(1)] = ops.get(m.group(1), 0) + 1
print(sorted(ops.items(), key=lambda kv: -kv[1])[:25])
