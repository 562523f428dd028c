"""Dump optimized HLO for the fast (param updates) vs slow (computed
updates) segment_sum to find what changes in the scatter lowering."""
import sys
import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

N = 1 << 22
G = 256
rng = np.random.default_rng(0)
x_d = jax.device_put(rng.random(N).astype(np.float32))
vx_d = jax.device_put((rng.random(N) > 0.05))
seg_d = jax.device_put((rng.integers(0, 30, N) % G).astype(np.int32))


def fast(s, x):
    return jax.ops.segment_sum(x, s, num_segments=G)


def slow(s, x, vx):
    xx = jnp.where(vx, x, 0.0) * 2.0
    return jax.ops.segment_sum(xx, s, num_segments=G)


for name, fn, args in (("FAST", fast, (seg_d, x_d)),
                       ("SLOW", slow, (seg_d, x_d, vx_d))):
    c = jax.jit(fn).lower(*args).compile()
    txt = c.as_text()
    print(f"==== {name}: {len(txt)} chars ====", flush=True)
    for line in txt.splitlines():
        l = line.strip()
        if ("scatter" in l or "fusion" in l or "sort" in l.lower()
                or "while" in l or "custom-call" in l):
            print(l[:300], flush=True)
    print(flush=True)
