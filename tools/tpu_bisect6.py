"""Round 6: find the poison op inside hash_column32 when composed with a
scatter in one jit. Cycle 3 buffers."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from pg_strom_tpu import T
from pg_strom_tpu.ops.hashing import hash_column32, combine_hashes32, _mix32

dev = jax.devices()[0]
on_tpu = dev.platform != "cpu"
N = 1 << 22 if on_tpu else 1 << 18
G = 256

rng = np.random.default_rng(0)
keys = [jax.device_put(rng.integers(0, 30, N).astype(np.int32)) for _ in range(3)]
xs = [jax.device_put(rng.random(N).astype(np.float32)) for _ in range(3)]
vks = [jax.device_put(np.ones(N, dtype=np.bool_)) for _ in range(3)]


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
    print(f"{name:52s} compile={tc:6.1f}s steady={best*1e3:9.3f}ms "
          f"{N/best/1e9:7.2f} Grows/s", flush=True)


def scat(x, seg):
    return jax.ops.segment_sum(x, seg, num_segments=G)


def mix(x):
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


# a: mix + u32 select on valid
fa = jax.jit(lambda k, vk, x: scat(x, jnp.where(
    vk, mix(k.astype(jnp.uint32)), jnp.uint32(0x9E3779B9)).astype(jnp.int32)
    & jnp.int32(G - 1)))
bench("a mix + where(valid,u32,tag) -> scatter", lambda i: fa(keys[i], vks[i], xs[i]))

# b: mix only (no select)
fb = jax.jit(lambda k, x: scat(x, (mix(k.astype(jnp.uint32))
                                   & jnp.uint32(G - 1)).astype(jnp.int32)))
bench("b mix only -> scatter", lambda i: fb(keys[i], xs[i]))

# c: double mix (hash_column32 + combine = 2 mixes + extras)
fc = jax.jit(lambda k, x: scat(x, (mix(mix(k.astype(jnp.uint32)))
                                   & jnp.uint32(G - 1)).astype(jnp.int32)))
bench("c mix(mix()) -> scatter", lambda i: fc(keys[i], xs[i]))

# d: the real thing: hash_column32 + combine_hashes32 -> scatter
def fd_(k, vk, x):
    h = combine_hashes32([hash_column32(T.INT4, k, vk)])
    return scat(x, (h & jnp.uint32(G - 1)).astype(jnp.int32))
fd = jax.jit(fd_)
bench("d hash_column32+combine -> scatter", lambda i: fd(keys[i], vks[i], xs[i]))

# e: combine_hashes32 alone on mix (zeros_like acc chain)
def fe_(k, x):
    h = mix(k.astype(jnp.uint32))
    acc = jnp.zeros_like(h)
    acc = mix(acc ^ (h + jnp.uint32(0x9E3779B9) + (acc << 6) + (acc >> 2)))
    return scat(x, (acc & jnp.uint32(G - 1)).astype(jnp.int32))
fe = jax.jit(fe_)
bench("e mix+combine-chain -> scatter", lambda i: fe(keys[i], xs[i]))

# f: _fold32 path: int32->int32->uint32 casts
def ff_(k, vk, x):
    d = k.astype(jnp.int32).astype(jnp.uint32)
    h = mix(d)
    h = jnp.where(vk, h, jnp.uint32(0x9E3779B9))
    return scat(x, (h & jnp.uint32(G - 1)).astype(jnp.int32))
ff = jax.jit(ff_)
bench("f fold-cast + mix + where -> scatter", lambda i: ff(keys[i], vks[i], xs[i]))
