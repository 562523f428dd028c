"""Isolate V-build costs: stack axis, u64 limbs, f4 limb loop.

Fresh-process probe; fetch once before timing (BASELINE env truths).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def timeit(fn, args, tag, rounds=3, window=4):
    out = fn(*args)
    jax.block_until_ready(out)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"{tag}: {best*1e3:.2f} ms", file=sys.stderr)
    return best


N = 1 << 24
S = 47


def cols_47(x32, y64):
    """47 bf16 columns, mirroring the flagship mix of cheap + limb columns."""
    out = [(x32 > 0.25).astype(jnp.bfloat16)]
    # u64 limbs of y (13 cols: 5 + 8)
    u = y64.astype(jnp.uint64)
    for j in range(5):
        out.append(((u >> jnp.uint64(8 * j)) & jnp.uint64(0xFF))
                   .astype(jnp.bfloat16))
    uu = u * u
    for j in range(8):
        out.append(((uu >> jnp.uint64(8 * j)) & jnp.uint64(0xFF))
                   .astype(jnp.bfloat16))
    # f4 fixed-point digit loop (9 cols x 2 sign blocks = 18)
    ax = jnp.abs(x32)
    v = ax * jnp.float32(0.5)
    hi = []
    for _ in range(9):
        v = v * jnp.float32(256.0)
        d = jnp.floor(v)
        v = v - d
        hi.append(d.astype(jnp.bfloat16))
    out.extend(hi)
    pos = jnp.where(x32 > 0, ax, 0.0) * jnp.float32(0.5)
    for _ in range(9):
        pos = pos * jnp.float32(256.0)
        d = jnp.floor(pos)
        pos = pos - d
        out.append(d.astype(jnp.bfloat16))
    # u64 limbs of biased y sum (8) + misc cheap cols to reach 47
    b = u + jnp.uint64(1 << 63)
    for j in range(8):
        out.append(((b >> jnp.uint64(8 * j)) & jnp.uint64(0xFF))
                   .astype(jnp.bfloat16))
    while len(out) < S:
        out.append(ax.astype(jnp.bfloat16))
    return out[:S]


def stack1(x32, y64):
    V = jnp.stack(cols_47(x32, y64), axis=1)
    return jnp.sum(V.astype(jnp.float32), axis=0)


def stack0(x32, y64):
    V = jnp.stack(cols_47(x32, y64), axis=0)      # (S, N): contiguous lanes
    return jnp.sum(V.astype(jnp.float32), axis=1)


def stack0_dot(x32, y64):
    V = jnp.stack(cols_47(x32, y64), axis=0)      # (S, N)
    G, SEG = 256, 1 << 16
    nseg = N // SEG
    seg = (y64 % G).astype(jnp.int32)
    oh = jax.nn.one_hot(seg.reshape(nseg, SEG), G, dtype=jnp.bfloat16)
    vb = V.reshape(S, nseg, SEG)
    # contract over rows: oh [nseg, SEG, G] x vb [S, nseg, SEG] -> [nseg, G, S]
    part = jax.lax.dot_general(oh, vb, (((1,), (2,)), ((0,), (1,))),
                               preferred_element_type=jnp.float32)
    return jnp.sum(part.astype(jnp.int64), axis=0)


def only_u64(x32, y64):
    u = y64.astype(jnp.uint64)
    uu = u * u
    out = [((uu >> jnp.uint64(8 * j)) & jnp.uint64(0xFF)).astype(jnp.bfloat16)
           for j in range(8)]
    V = jnp.stack(out, axis=0)
    return jnp.sum(V.astype(jnp.float32), axis=1)


def only_f4(x32, y64):
    ax = jnp.abs(x32) * jnp.float32(0.5)
    hi = []
    for _ in range(9):
        ax = ax * jnp.float32(256.0)
        d = jnp.floor(ax)
        ax = ax - d
        hi.append(d.astype(jnp.bfloat16))
    V = jnp.stack(hi, axis=0)
    return jnp.sum(V.astype(jnp.float32), axis=1)


def main():
    rng = np.random.default_rng(0)
    x32 = jax.device_put(rng.random(N).astype(np.float32))
    y64 = jax.device_put(rng.integers(0, 1 << 40, N).astype(np.int64))
    timeit(jax.jit(stack1), (x32, y64), "stack axis=1 (N,S)")
    timeit(jax.jit(stack0), (x32, y64), "stack axis=0 (S,N)")
    timeit(jax.jit(stack0_dot), (x32, y64), "stack axis=0 + one-hot dot")
    timeit(jax.jit(only_u64), (x32, y64), "u64 sq limbs only (8 cols)")
    timeit(jax.jit(only_f4), (x32, y64), "f4 digit loop only (9 cols)")


if __name__ == "__main__":
    main()
