"""Round 2: does optimization_barrier on scatter operands fix the cliff?"""
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
key_d = jax.device_put(rng.integers(0, 30, N).astype(np.int32))
x_d = jax.device_put(rng.random(N).astype(np.float32))
y_d = jax.device_put(rng.integers(0, 1 << 40, N).astype(np.int64))
vk_d = jax.device_put(np.ones(N, dtype=np.bool_))
vx_d = jax.device_put((rng.random(N) > 0.05))


def bench(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 5)
    print(f"{name:44s} compile={tc:7.2f}s steady={best*1e3:9.3f}ms "
          f"{N/best/1e9:7.2f} Grows/s", flush=True)


def seg_ids(k, vk):
    h = combine_hashes32([hash_column32(T.INT4, k, vk)])
    return ((_mix32(h) & jnp.uint32(G - 1))).astype(jnp.int32)


# 1: barrier on seg only (what preagg does today)
def f1(k, vk, x):
    seg = seg_ids(k, vk)
    seg = jax.lax.optimization_barrier(seg)
    return jax.ops.segment_sum(x, seg, num_segments=G)
bench("1 hash->barrier(seg)->segsum(raw x)", jax.jit(f1), key_d, vk_d, x_d)

# 2: computed updates, argument seg  (J-analog)
seg_pre = jax.device_put(np.asarray(jax.jit(seg_ids)(key_d, vk_d)))
def f2(seg, x, vx):
    xx = jnp.where(vx, x, 0.0) * 2.0
    return jax.ops.segment_sum(xx, seg, num_segments=G)
bench("2 argseg + computed updates", jax.jit(f2), seg_pre, x_d, vx_d)

# 3: computed updates behind barrier
def f3(seg, x, vx):
    xx = jnp.where(vx, x, 0.0) * 2.0
    xx = jax.lax.optimization_barrier(xx)
    return jax.ops.segment_sum(xx, seg, num_segments=G)
bench("3 argseg + barrier(updates)", jax.jit(f3), seg_pre, x_d, vx_d)

# 4: everything computed, barrier on both
def f4(k, vk, x, vx):
    seg = seg_ids(k, vk)
    xx = jnp.where(vx & vk, x, 0.0)
    seg, xx = jax.lax.optimization_barrier((seg, xx))
    return jax.ops.segment_sum(xx, seg, num_segments=G)
bench("4 hash+updates, barrier(both)", jax.jit(f4), key_d, vk_d, x_d, vx_d)

# 5: i64 version with f64 shadow, barrier on all scatter inputs
def f5(k, vk, y, vx):
    seg = seg_ids(k, vk)
    ok = vk & vx
    yy = jnp.where(ok, y, jnp.int64(0))
    sh = jnp.where(ok, y.astype(jnp.float64), 0.0)
    seg, yy, sh = jax.lax.optimization_barrier((seg, yy, sh))
    s = jax.ops.segment_sum(yy, seg, num_segments=G)
    s2 = jax.ops.segment_sum(sh, seg, num_segments=G)
    return s, s2
bench("5 i64+f64shadow, barrier(all)", jax.jit(f5), key_d, vk_d, y_d, vx_d)

# 6: host scalar arg in the chain (nrows-style), barriers on
def f6(k, vk, x, nrows):
    live = (jnp.arange(N, dtype=jnp.int32) < nrows) & vk
    seg = seg_ids(k, live)
    xx = jnp.where(live, x, 0.0)
    seg, xx = jax.lax.optimization_barrier((seg, xx))
    return jax.ops.segment_sum(xx, seg, num_segments=G)
bench("6 +host nrows scalar, barrier(both)", jax.jit(f6), key_d, vk_d, x_d,
      np.int32(N))

# 7: like 4 but WITHOUT barrier — the control
def f7(k, vk, x, vx):
    seg = seg_ids(k, vk)
    xx = jnp.where(vx & vk, x, 0.0)
    return jax.ops.segment_sum(xx, seg, num_segments=G)
bench("7 hash+updates, NO barrier (control)", jax.jit(f7), key_d, vk_d, x_d, vx_d)
