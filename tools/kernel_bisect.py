"""Bisect the fused preagg kernel's 10.8ms: one-hot build vs V build vs dot.

Variants of the same grid/tile structure (G=256, TILE=16384, N=16M):
  dot-only    : one-hot + dot, V = raw f32 lanes cast to bf16 (1 col used)
  onehot-only : build one-hot, reduce it with jnp.sum (no MXU dot)
  vbuild-only : build the 50-col V tile, reduce with jnp.sum (no dot)
  full-mock   : one-hot + 50-col V build + dot  (mirrors the real kernel)
  int8-dot    : one-hot int8 + V int8, dot_general int8->int32 (2x MXU probe)

Fresh process per run recommended (tools/tpu_iso_test.sh pattern); this
script runs them all in one process — acceptable for relative comparison.
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 256
TILE = 16384
NLOG = int(sys.argv[1]) if len(sys.argv) > 1 else 24
N = 1 << NLOG
NSTEPS = N // TILE
NIN = 15


def timeit(fn, args, tag, rounds=3, window=8):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s")
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"{tag}: {best*1e3:.2f} ms  ({N/best/1e9:.2f} Grows/s)")
    return best


def build_v(in_refs, mask, dtype):
    """50-col V build mimicking the real plan: 1 mask + 1 bool + 4x limbs4
    blocks x 3 + ... padded to 128."""
    rows = [mask.astype(dtype)]
    k = 0
    for i in range(NIN):
        u = in_refs[i][:].reshape(1, TILE)
        if i % 3 == 2:
            rows.append((u > jnp.uint32(0)).astype(jnp.int32).astype(dtype))
            k += 1
        else:
            sh = (jax.lax.broadcasted_iota(jnp.uint32, (4, TILE), 0)
                  * jnp.uint32(8))
            rows.append(((u >> sh) & jnp.uint32(0xFF))
                        .astype(jnp.int32).astype(dtype))
            k += 4
    pad = 128 - (k + 1)
    rows.append(jnp.zeros((pad, TILE), dtype))
    return jnp.concatenate(rows, axis=0)


def make_kernel(variant):
    dtype = jnp.int8 if variant == "int8-dot" else jnp.bfloat16
    acct = jnp.int32 if variant == "int8-dot" else jnp.float32

    def kernel(*refs):
        seg_ref = refs[0]
        in_refs = refs[1:1 + NIN]
        out_ref = refs[1 + NIN]
        acc = refs[2 + NIN]
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc[:] = jnp.zeros_like(acc)

        seg = seg_ref[:].reshape(1, TILE)
        mask = seg < jnp.int32(G)

        if variant == "dot-only":
            u = in_refs[0][:].reshape(1, TILE)
            Vt = jnp.broadcast_to((u & jnp.uint32(0xFF))
                                  .astype(jnp.int32).astype(dtype),
                                  (128, TILE))
            oht = (seg == jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 0)
                   ).astype(dtype)
            acc[:] += jax.lax.dot_general(
                oht, Vt, (((1,), (1,)), ((), ())),
                preferred_element_type=acct)
        elif variant == "onehot-only":
            oht = (seg == jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 0)
                   ).astype(dtype)
            acc[:] += jnp.sum(oht.astype(acct), axis=1,
                              keepdims=True) * jnp.ones((1, 128), acct)
        elif variant == "vbuild-only":
            Vt = build_v(in_refs, mask, dtype)
            acc[:] += jnp.broadcast_to(
                jnp.sum(Vt.astype(acct), axis=1, keepdims=True), (128, 128)
            )[:G & 0xFFFF][:G] if False else (
                jnp.zeros((G, 128), acct)
                .at[0:1, :].add(jnp.sum(Vt.astype(acct), axis=1)[None, :128]
                                [:, :128]))
        else:  # full-mock / int8-dot
            Vt = build_v(in_refs, mask, dtype)
            oht = (seg == jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 0)
                   ).astype(dtype)
            acc[:] += jax.lax.dot_general(
                oht, Vt, (((1,), (1,)), ((), ())),
                preferred_element_type=acct)

        @pl.when(step == jnp.int32(NSTEPS - 1))
        def _():
            out_ref[:] = acc[:]

    lane_spec = pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((G, 128), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(NSTEPS,),
        in_specs=[lane_spec] * (1 + NIN),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((G, 128), acct),
        scratch_shapes=[pltpu.VMEM((G, 128), acct)],
    )


def main():
    rng = np.random.default_rng(0)
    seg = jax.device_put(rng.integers(0, G, N).astype(np.int32))
    ins = [jax.device_put(rng.integers(0, 1 << 30, N).astype(np.uint32))
           for _ in range(NIN)]

    for variant in ("dot-only", "full-mock", "int8-dot"):
        try:
            f = jax.jit(functools.partial(lambda s, i, v: make_kernel(v)(s, *i),
                                          v=variant))
            timeit(f, (seg, ins), variant)
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
