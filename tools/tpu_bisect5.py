"""Round 5: separate the two suspects — u32 hash chain cost vs
computed-operand scatter cost. Cycle 3 buffers everywhere (no cache doubt)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
on_tpu = dev.platform != "cpu"
N = 1 << 22 if on_tpu else 1 << 18
G = 256

rng = np.random.default_rng(0)
keys = [jax.device_put(rng.integers(0, 30, N).astype(np.int32)) for _ in range(3)]
xs = [jax.device_put(rng.random(N).astype(np.float32)) for _ in range(3)]
vs = [jax.device_put(rng.random(N) > 0.05) for _ in range(3)]
segs = [jax.device_put(rng.integers(0, G, N).astype(np.int32)) for _ in range(3)]


def bench(name, call):
    t0 = time.perf_counter()
    jax.block_until_ready(call(0))
    tc = time.perf_counter() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for i in range(6):
            out = call(i % 3)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 6)
    print(f"{name:48s} compile={tc:6.1f}s steady={best*1e3:9.3f}ms "
          f"{N/best/1e9:7.2f} Grows/s", flush=True)


# -- hash chain cost, isolated (no scatter) ---------------------------------
def mix_u32(x):
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)

f1 = jax.jit(lambda k: (mix_u32(k.astype(jnp.uint32)) & jnp.uint32(G - 1))
             .astype(jnp.int32))
bench("1 u32 mix chain alone -> seg ids", lambda i: f1(keys[i]))

def mix_i32(x):
    x = x.astype(jnp.int32)
    x = (x ^ ((x >> 16) & jnp.int32(0xFFFF))) * jnp.int32(0x7FEB352D)
    x = (x ^ ((x >> 15) & jnp.int32(0x1FFFF))) * jnp.int32(-2073113461)
    return x ^ ((x >> 16) & jnp.int32(0xFFFF))

f2 = jax.jit(lambda k: (mix_i32(k) & jnp.int32(G - 1)))
bench("2 i32 mix chain alone -> seg ids", lambda i: f2(keys[i]))

# -- minimal computed-updates scatter ---------------------------------------
f3 = jax.jit(lambda s, x: jax.ops.segment_sum(x * 2.0, s, num_segments=G))
bench("3 scatter, updates = x*2", lambda i: f3(segs[i], xs[i]))

f4 = jax.jit(lambda s, x, v: jax.ops.segment_sum(jnp.where(v, x, 0.0), s,
                                                 num_segments=G))
bench("4 scatter, updates = where(v,x,0)", lambda i: f4(segs[i], xs[i], vs[i]))

# -- computed seg ids (cheap int op, no hash) -------------------------------
f5 = jax.jit(lambda k, x: jax.ops.segment_sum(x, k & jnp.int32(G - 1),
                                              num_segments=G))
bench("5 scatter, seg = k & 255 (computed)", lambda i: f5(keys[i], xs[i]))

# -- two-jit: computed updates materialized by jit1, scatter in jit2 --------
g1 = jax.jit(lambda x, v: jnp.where(v, x, 0.0))
g2 = jax.jit(lambda s, xx: jax.ops.segment_sum(xx, s, num_segments=G))
def two_jit(i):
    return g2(segs[i], g1(xs[i], vs[i]))
bench("6 two-jit: jit1 where | jit2 scatter", two_jit)

# -- i32 hash two-jit: hash in jit1, scatter in jit2 ------------------------
def two_jit_hash(i):
    return g2(f2(keys[i]), xs[i])
bench("7 two-jit: jit1 i32hash | jit2 scatter", two_jit_hash)
