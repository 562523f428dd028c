"""Probe 2: one-hot GENERATION cost inside the fused kernel.

Variants (all end in the same (G,LANES) accumulate so nothing dead-codes):
  floor_bf16   — oht loaded from VMEM scratch (built once at step 0):
                 per-step gen cost ~0 => the MXU+limb floor, bf16 dot
  floor_int8   — same, int8 dot => int8 MXU floor
  gen_i32      — iota int32 == seg int32 -> bf16 (current kernel's shape)
  gen_bf16     — (G,1) bf16 iota vs (1,TILE) bf16 seg compare -> bf16 select
                 (2x packed VPU if Mosaic packs bf16 compares)
  gen_i8       — int8 compare -> int8 one-hot -> int8 dot (4x if packed)
  gen_u32bit   — seg -> bit-plane packed compare:  oht from 1-bit planes? (skip)

Usage: python tools/probe_onehot_gen.py [N_log2] [G] [TILE] [variants]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401
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
    print(f"{tag}: {best*1e3:.2f} ms  {args[0].shape[0]/best/1e9:.2f} Grows/s",
          flush=True)
    return best


def make(kind: str, N: int, G: int, TILE: int):
    nsteps = N // TILE
    int8_dot = kind in ("floor_int8", "gen_i8", "gen_i8cast", "gen_i8iota",
                        "gen_i16iota")

    def kernel(seg_ref, v_ref, out_ref, acc):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc[:] = jnp.zeros_like(acc)

        seg = seg_ref[:].reshape(1, TILE)
        v = v_ref[:].reshape(1, TILE)
        # limb build: 5 int8 limbs or 4 bf16 limbs (the real kernel's VPU work)
        u = v.astype(jnp.uint32)
        if int8_dot:
            sh = (jax.lax.broadcasted_iota(jnp.uint32, (5, TILE), 0)
                  * jnp.uint32(7))
            limbs = ((u >> sh) & jnp.uint32(0x7F)).astype(jnp.int8)
            Vt = jnp.concatenate(
                [limbs, jnp.zeros((LANES - 5, TILE), jnp.int8)], axis=0)
        else:
            sh = (jax.lax.broadcasted_iota(jnp.uint32, (4, TILE), 0)
                  * jnp.uint32(8))
            limbs = ((u >> sh) & jnp.uint32(0xFF)).astype(jnp.int32) \
                .astype(jnp.bfloat16)
            Vt = jnp.concatenate(
                [limbs, jnp.zeros((LANES - 4, TILE), jnp.bfloat16)], axis=0)

        if kind == "gen_i32":
            iota = jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 0)
            oht = (seg == iota).astype(jnp.bfloat16)
        elif kind == "gen_bf16":
            giota = (jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
                     .astype(jnp.bfloat16))
            segb = seg.astype(jnp.bfloat16)
            oht = jnp.where(giota == segb, jnp.bfloat16(1), jnp.bfloat16(0))
        elif kind == "gen_i8cast":
            iota = jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 0)
            oht = (seg == iota).astype(jnp.int8)
        elif kind == "gen_bf16iota":
            iota = jax.lax.broadcasted_iota(jnp.bfloat16, (G, TILE), 0)
            segb = seg.astype(jnp.bfloat16)
            oht = jnp.where(iota == segb, jnp.bfloat16(1), jnp.bfloat16(0))
        elif kind == "gen_i8iota":
            iota = jax.lax.broadcasted_iota(jnp.int8, (G, TILE), 0)
            seg8 = seg.astype(jnp.int8)
            oht = jnp.where(iota == seg8, jnp.int8(1), jnp.int8(0))
        elif kind == "gen_i16iota":
            iota = jax.lax.broadcasted_iota(jnp.int16, (G, TILE), 0)
            seg16 = seg.astype(jnp.int16)
            oht = jnp.where(iota == seg16, jnp.int8(1), jnp.int8(0))
        elif kind == "gen_i8":
            giota = (jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
                     .astype(jnp.int8))
            seg8 = seg.astype(jnp.int8)
            oht = jnp.where(giota == seg8, jnp.int8(1), jnp.int8(0))
        else:
            raise ValueError(kind)

        if int8_dot:
            acc[:] += jax.lax.dot_general(
                oht, Vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            acc[:] += jax.lax.dot_general(
                oht, Vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(step == jnp.int32(nsteps - 1))
        def _():
            out_ref[:] = acc[:].astype(jnp.float32)

    lane_spec = pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((G, LANES), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    adt = jnp.int32 if int8_dot else jnp.float32
    return pl.pallas_call(
        kernel, grid=(nsteps,),
        in_specs=[lane_spec, lane_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((G, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G, LANES), adt)],
    )


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    TILE = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
    N = 1 << nlog
    rng = np.random.default_rng(0)
    seg = jax.device_put(rng.integers(0, G, N).astype(np.int32))
    v = jax.device_put(rng.integers(0, 1 << 31, N).astype(np.int32))

    kinds = (sys.argv[4].split(",") if len(sys.argv) > 4 else
             ["gen_i32", "gen_bf16", "gen_i8cast", "gen_i8"])
    for kind in kinds:
        try:
            f = jax.jit(make(kind, N, G, TILE))
            timeit(f, (seg, v), kind)
        except Exception as e:  # noqa: BLE001
            print(f"{kind}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
