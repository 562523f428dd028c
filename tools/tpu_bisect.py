"""Bisect the preagg kernel slowdown on the real TPU.

Times a ladder of kernel variants from raw segment_sum up to the full
build_preagg_fn, printing compile time and steady-state min latency for
each, so the pathological component is identifiable.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from pg_strom_tpu import T
from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function
from pg_strom_tpu.expr.lower_jax import ColMeta
from pg_strom_tpu.ops.preagg import (AggInstance, lookup_agg, build_preagg_fn,
                                     _seg, _bucket_mixed)
from pg_strom_tpu.ops.hashing import hash_column32, combine_hashes32, _mix32

dev = jax.devices()[0]
on_tpu = dev.platform != "cpu"
N = 1 << 22 if on_tpu else 1 << 18
G = 256

rng = np.random.default_rng(0)
key_np = rng.integers(0, 30, N).astype(np.int32)
x_np = rng.random(N).astype(np.float32)
y_np = rng.integers(0, 1 << 40, N).astype(np.int64)
vx_np = rng.random(N) > 0.05
vy_np = rng.random(N) > 0.05

key_d = jax.device_put(key_np)
x_d = jax.device_put(x_np)
y_d = jax.device_put(y_np)
vk_d = jax.device_put(np.ones(N, dtype=np.bool_))
vx_d = jax.device_put(vx_np)
vy_d = jax.device_put(vy_np)
seg_np = (key_np % G).astype(np.int32)
seg_d = jax.device_put(seg_np)


def bench(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    best = float("inf")
    reps = 5 if on_tpu else 2
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:40s} compile+1st={tc:7.2f}s  steady={best*1e3:9.3f}ms  "
          f"{N/best/1e9:8.2f} Grows/s", flush=True)
    return best


# A: raw f32 segment_sum, precomputed seg ids
bench("A raw segsum f32", jax.jit(
    lambda s, x: jax.ops.segment_sum(x, s, num_segments=G)), seg_d, x_d)

# B: raw i64 segment_sum
bench("B raw segsum i64", jax.jit(
    lambda s, y: jax.ops.segment_sum(y, s, num_segments=G)), seg_d, y_d)

# C: hash chain (u32) -> seg ids -> f32 segsum
def c_fn(k, vk, x):
    h = combine_hashes32([hash_column32(T.INT4, k, vk)])
    h = _mix32(h ^ jnp.uint32(0))
    seg = (h & jnp.uint32(G - 1)).astype(jnp.int32)
    return jax.ops.segment_sum(x, seg, num_segments=G)
bench("C u32hash+segsum f32", jax.jit(c_fn), key_d, vk_d, x_d)

# D: C + i64 sum + f64 shadow (the sum_i slot shape)
def d_fn(k, vk, y, vy):
    h = combine_hashes32([hash_column32(T.INT4, k, vk)])
    seg = ((_mix32(h) & jnp.uint32(G - 1))).astype(jnp.int32)
    ok = vk & vy
    yy = jnp.where(ok, y, jnp.int64(0))
    s = jax.ops.segment_sum(yy, seg, num_segments=G)
    sh = jax.ops.segment_sum(jnp.where(ok, y.astype(jnp.float64), 0.0),
                             seg, num_segments=G)
    return s, sh
bench("D u32hash+segsum i64+f64shadow", jax.jit(d_fn), key_d, vk_d, y_d, vy_d)

# E: full preagg via build_preagg_fn (same as bench.py flagship)
schema = [ColMeta("key", T.INT4), ColMeta("x", T.FLOAT4), ColMeta("y", T.INT8)]
keyref = ColumnRef(type=T.INT4, name="key", index=0)
xref = ColumnRef(type=T.FLOAT4, name="x", index=1)
yref = ColumnRef(type=T.INT8, name="y", index=2)
pred = resolve_function(">", (xref, Const(type=T.FLOAT4, value=0.25)))
insts = []
for aggname, arg in (("sum", xref), ("count", xref), ("sum", yref)):
    d, fam = lookup_agg(aggname, (arg.type,))
    insts.append(AggInstance(aggname=aggname, family=fam,
                             slots=d.slots, args=(arg,)))
cols = ((key_d, vk_d), (x_d, vx_d), (y_d, vy_d))
nrows = np.int32(N)

variants = [
    ("E full (pred+keys+3aggs)", insts, pred, [keyref]),
    ("F no-pred", insts, None, [keyref]),
    ("G only sum(x) f32", insts[:1], None, [keyref]),
    ("H only count", insts[1:2], None, [keyref]),
    ("I only sum(y) i64", insts[2:3], None, [keyref]),
    ("J ungrouped 3aggs", insts, pred, []),
]
for name, ii, pp, gg in variants:
    fn = jax.jit(build_preagg_fn(schema, [g for g in gg], ii, pp, G=G))
    bench(name, fn, cols, nrows, np.uint64(0))
