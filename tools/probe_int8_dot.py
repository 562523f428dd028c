"""Probe: inside a Pallas kernel on this Mosaic service —
  a) bf16 one-hot generation + dot (the fused kernel's MXU core)
  b) s8 one-hot + s8 V -> s32 dot (is it supported? is it 2x?)
  c) one-hot generation alone (VPU share)
  d) dot alone with precomputed constant-ish one-hot (MXU share)

Fresh-process ground truth for the int8 fused-preagg redesign.
Usage: python tools/probe_int8_dot.py [N_log2] [G] [TILE]
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def timeit(fn, args, tag, rounds=3, window=8):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    r = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s "
          f"chk={np.asarray(r).reshape(-1)[:2]}", flush=True)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"{tag}: {best*1e3:.2f} ms", flush=True)
    return best


def make(kind: str, N: int, G: int, TILE: int):
    nsteps = N // TILE

    def kernel(seg_ref, v_ref, out_ref, acc):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc[:] = jnp.zeros_like(acc)

        seg = seg_ref[:].reshape(1, TILE)
        v = v_ref[:].reshape(1, TILE)
        iota = jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 0)
        if kind in ("bf16", "bf16_dotonly"):
            if kind == "bf16":
                oht = (seg == iota).astype(jnp.bfloat16)
            else:
                oht = (jnp.int32(1) == iota).astype(jnp.bfloat16)
            sh = (jax.lax.broadcasted_iota(jnp.uint32, (4, TILE), 0)
                  * jnp.uint32(8))
            u = v.astype(jnp.uint32)
            limbs = ((u >> sh) & jnp.uint32(0xFF)).astype(jnp.int32) \
                .astype(jnp.bfloat16)
            Vt = jnp.concatenate(
                [limbs, jnp.zeros((LANES - 4, TILE), jnp.bfloat16)], axis=0)
            acc[:] += jax.lax.dot_general(
                oht, Vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif kind == "int8":
            oht = (seg == iota).astype(jnp.int8)
            sh = (jax.lax.broadcasted_iota(jnp.uint32, (5, TILE), 0)
                  * jnp.uint32(7))
            u = v.astype(jnp.uint32)
            limbs = ((u >> sh) & jnp.uint32(0x7F)).astype(jnp.int8)
            Vt = jnp.concatenate(
                [limbs, jnp.zeros((LANES - 5, TILE), jnp.int8)], axis=0)
            acc[:] += jax.lax.dot_general(
                oht, Vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        elif kind == "int8_i32acc":
            oht = (seg == iota).astype(jnp.int8)
            sh = (jax.lax.broadcasted_iota(jnp.uint32, (5, TILE), 0)
                  * jnp.uint32(7))
            u = v.astype(jnp.uint32)
            limbs = ((u >> sh) & jnp.uint32(0x7F)).astype(jnp.int8)
            Vt = jnp.concatenate(
                [limbs, jnp.zeros((LANES - 5, TILE), jnp.int8)], axis=0)
            acc[:] += jax.lax.dot_general(
                oht, Vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        elif kind == "onehot_only":
            oht = (seg == iota).astype(jnp.bfloat16)
            acc[:] += jnp.sum(oht, axis=1, keepdims=True) + \
                v.astype(jnp.bfloat16)[0, 0]
        else:
            raise ValueError(kind)

        @pl.when(step == jnp.int32(nsteps - 1))
        def _():
            out_ref[:] = acc[:].astype(jnp.float32)

    lane_spec = pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    if kind == "onehot_only":
        oshape, adt = (G, 1), jnp.bfloat16
    elif kind == "int8_i32acc":
        oshape, adt = (G, LANES), jnp.int32
    else:
        oshape, adt = (G, LANES), jnp.float32
    out_spec = pl.BlockSpec(oshape, lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(nsteps,),
        in_specs=[lane_spec, lane_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32
                                       if adt is not jnp.int32 else
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM(oshape, adt)],
    )


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    TILE = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
    N = 1 << nlog
    rng = np.random.default_rng(0)
    seg = jax.device_put(rng.integers(0, G, N).astype(np.int32))
    v = jax.device_put(rng.integers(0, 1 << 31, N).astype(np.int32))

    for kind in (sys.argv[4].split(",") if len(sys.argv) > 4 else
                 ["bf16", "int8", "int8_i32acc", "bf16_dotonly",
                  "onehot_only"]):
        try:
            f = jax.jit(make(kind, N, G, TILE))
            dt = timeit(f, (seg, v), kind)
            print(f"{kind}: {N/dt/1e9:.2f} Grows/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{kind}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
