"""Probe: is s8xs8->s32 one-hot dot faster than the bf16 formulation?

Ground-truth probe for the MXU grouping kernel's dtype choice (run in a
fresh process; fetch once before timing — see BASELINE.md env truths).

  bf16:  oh = one_hot(seg, G, bf16);  dot(oh^T, V_bf16) -> f32
  int8:  oh = one_hot(seg, G, s8);    dot(oh^T, V_s8)   -> s32

V is S columns of 8-bit limb digits (the real kernel's shape).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp


def timeit(fn, args, tag, rounds=3, window=4):
    out = fn(*args)
    jax.block_until_ready(out)
    r = jax.device_get(jax.tree_util.tree_leaves(out)[0])  # force sync mode
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"{tag}: {best*1e3:.2f} ms", file=sys.stderr)
    return best, r


def main():
    N = 1 << 24
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    S = 48
    SEG = 1 << 16

    rng = np.random.default_rng(0)
    seg = jax.device_put(rng.integers(0, G, N).astype(np.int32))
    Vd = jax.device_put(rng.integers(0, 256, (N, S)).astype(np.uint8))

    def bf16(seg_id, V8):
        nseg = N // SEG
        oh = jax.nn.one_hot(seg_id.reshape(nseg, SEG), G, dtype=jnp.bfloat16)
        vb = V8.reshape(nseg, SEG, S).astype(jnp.bfloat16)
        part = jax.lax.dot_general(oh, vb, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        return jnp.sum(part.astype(jnp.int64), axis=0)

    def int8_seg(seg_id, V8):
        # biased digits in [-128,127]; correction happens host-side
        nseg = N // SEG
        oh = jax.nn.one_hot(seg_id.reshape(nseg, SEG), G, dtype=jnp.int8)
        vb = (V8.reshape(nseg, SEG, S).astype(jnp.int16)
              - jnp.int16(128)).astype(jnp.int8)
        part = jax.lax.dot_general(oh, vb, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.int32)
        return jnp.sum(part.astype(jnp.int64), axis=0)

    def int8_one(seg_id, V8):
        # single segment: int32 accumulation exact to 2^31 (N*128 = 2^31 edge
        # -> probe uses one big dot, real kernel would cap rows)
        oh = jax.nn.one_hot(seg_id, G, dtype=jnp.int8)
        vb = (V8.astype(jnp.int16) - jnp.int16(128)).astype(jnp.int8)
        return jax.lax.dot_general(oh, vb, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    fb = jax.jit(bf16)
    f8 = jax.jit(int8_seg)
    f1 = jax.jit(int8_one)

    tb, rb = timeit(fb, (seg, Vd), "bf16 segmented")
    t8, r8 = timeit(f8, (seg, Vd), "int8 segmented")
    t1, r1 = timeit(f1, (seg, Vd), "int8 single-dot")

    # correctness cross-check: int8 result + 128*rowcount == bf16 result
    sums8 = np.asarray(jax.device_get(f8(seg, Vd)), np.int64)
    cnt = np.bincount(np.asarray(jax.device_get(seg)), minlength=G)
    fixed = sums8 + 128 * cnt[:, None]
    ref = np.asarray(jax.device_get(fb(seg, Vd)), np.int64)
    ok = np.array_equal(fixed, ref)
    print(f"exact match after bias fix: {ok}", file=sys.stderr)
    print(f"speedup int8_seg vs bf16: {tb/t8:.2f}x; "
          f"int8_one vs bf16: {tb/t1:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
