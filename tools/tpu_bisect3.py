"""Round 3: candidate fixes for the computed-operand scatter cliff.

1. two-jit split  — elementwise program materializes seg+updates to HBM,
                    second program does param->param scatters (fast path)
2. matmul segsum  — one-hot matmul on the MXU via lax.scan over row blocks
3. matmul multi   — same, 6 value columns in one (G x S) dot
4. diagnostic     — computed-updates scatter at small/large N (S(1) theory)
"""
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
vk_d = jax.device_put(np.ones(N, dtype=np.bool_))
vx_d = jax.device_put((rng.random(N) > 0.05))


def bench(name, call):
    t0 = time.perf_counter()
    out = call()
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(5):
            out = call()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 5)
    print(f"{name:46s} compile={tc:7.2f}s steady={best*1e3:9.3f}ms "
          f"{N/best/1e9:7.2f} Grows/s", flush=True)
    return out


def seg_ids(k, vk):
    h = combine_hashes32([hash_column32(T.INT4, k, vk)])
    return ((_mix32(h) & jnp.uint32(G - 1))).astype(jnp.int32)


# ---- 1: two-jit split -------------------------------------------------------
@jax.jit
def phase_a(k, vk, x, vx):
    seg = seg_ids(k, vk)
    xx = jnp.where(vx & vk, x, 0.0)
    return seg, xx

@jax.jit
def phase_b(seg, xx):
    return jax.ops.segment_sum(xx, seg, num_segments=G)

def two_jit():
    seg, xx = phase_a(key_d, vk_d, x_d, vx_d)
    return phase_b(seg, xx)
r1 = bench("1 two-jit split (hash+mask | scatter)", two_jit)

# ---- 2: matmul segsum, one f32 column --------------------------------------
B = 1 << 15
NB = N // B
garange = jnp.arange(G, dtype=jnp.int32)

def matmul_segsum(k, vk, x, vx):
    seg = seg_ids(k, vk)
    xx = jnp.where(vx & vk, x, 0.0)
    def step(acc, inp):
        s, v = inp
        oh = (s[:, None] == garange[None, :]).astype(jnp.float32)   # B x G
        return acc + jax.lax.dot_general(
            oh, v[:, None], (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)[:, 0], None
    acc, _ = jax.lax.scan(step, jnp.zeros((G,), jnp.float32),
                          (seg.reshape(NB, B), xx.reshape(NB, B)))
    return acc
f2 = jax.jit(matmul_segsum)
r2 = bench("2 matmul segsum f32 (scan B=32k)", lambda: f2(key_d, vk_d, x_d, vx_d))

# ---- 3: matmul segsum, 6 columns at once -----------------------------------
def matmul_multi(k, vk, x, vx):
    seg = seg_ids(k, vk)
    ok = vx & vk
    cols = [jnp.where(ok, x, 0.0), ok.astype(jnp.float32),
            jnp.where(ok, x * x, 0.0), jnp.where(ok, x + 1.0, 0.0),
            jnp.where(ok, x * 0.5, 0.0), jnp.where(ok, 1.0 - x, 0.0)]
    V = jnp.stack(cols, axis=-1)                                   # N x 6
    def step(acc, inp):
        s, v = inp
        oh = (s[:, None] == garange[None, :]).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            oh, v, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST), None
    acc, _ = jax.lax.scan(step, jnp.zeros((G, 6), jnp.float32),
                          (seg.reshape(NB, B), V.reshape(NB, B, 6)))
    return acc
f3 = jax.jit(matmul_multi)
r3 = bench("3 matmul segsum 6 cols", lambda: f3(key_d, vk_d, x_d, vx_d))

# correctness cross-check vs two-jit
ref = np.asarray(r1)
got = np.asarray(r2)
print("  max |matmul - scatter| =", float(np.abs(ref - got).max()), flush=True)

# ---- 4: diagnostics on the S(1) theory -------------------------------------
for NN in (1 << 20, 1 << 24):
    xx_d = jax.device_put(rng.random(NN).astype(np.float32))
    vv_d = jax.device_put((rng.random(NN) > 0.05))
    ss_d = jax.device_put((rng.integers(0, G, NN)).astype(np.int32))
    def comp(s, x, vx):
        return jax.ops.segment_sum(jnp.where(vx, x, 0.0), s, num_segments=G)
    fc = jax.jit(comp)
    t0 = time.perf_counter(); jax.block_until_ready(fc(ss_d, xx_d, vv_d))
    tc = time.perf_counter() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(3):
            out = fc(ss_d, xx_d, vv_d)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 3)
    print(f"4 computed-updates scatter N=2^{int(np.log2(NN))}          "
          f"compile={tc:7.2f}s steady={best*1e3:9.3f}ms "
          f"{NN/best/1e9:7.2f} Grows/s", flush=True)
