"""Which Pallas feature breaks Mosaic legalization under jax_enable_x64?

Runs tiny kernels, one feature at a time, printing PASS/FAIL per variant.
All kernels are x64-clean (explicit int32 everywhere) — the client-side
weak-int promotion recursion is already understood; this probes the REMOTE
compiler ('failed to legalize func.return' HTTP 500s).

python tools/pallas_x64_bisect2.py [x64|x32]
"""
import sys

import numpy as np
import jax

if (len(sys.argv) > 1 and sys.argv[1] == "x64") or len(sys.argv) == 1:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, TILE, G, S = 1 << 14, 4096, 128, 128
nsteps = N // TILE


def try_one(tag, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"{tag}: PASS")
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:120]
        print(f"{tag}: FAIL {type(e).__name__} {msg}")
        return False


def main():
    rng = np.random.default_rng(0)
    x2d = rng.random((N, S)).astype(np.float32)
    seg = rng.integers(0, G, N).astype(np.int32)
    vb = rng.integers(0, 256, (N, S)).astype(jnp.bfloat16)

    # 1. no grid, elementwise
    def k1(x_ref, o_ref):
        o_ref[:] = x_ref[:] + jnp.float32(1.0)
    try_one("1 elementwise", pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((N, S), jnp.float32)), x2d)

    # 2. grid only
    def k2(x_ref, o_ref):
        o_ref[:] = x_ref[:] + jnp.float32(1.0)
    try_one("2 grid", pl.pallas_call(
        k2, grid=(nsteps,),
        in_specs=[pl.BlockSpec((TILE, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S), jnp.float32)), x2d)

    # 3. grid + pl.when(program_id)
    def k3(x_ref, o_ref):
        step = pl.program_id(0)
        o_ref[:] = x_ref[:]

        @pl.when(step == jnp.int32(0))
        def _():
            o_ref[:] = x_ref[:] + jnp.float32(1.0)
    try_one("3 grid+when", pl.pallas_call(
        k3, grid=(nsteps,),
        in_specs=[pl.BlockSpec((TILE, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S), jnp.float32)), x2d)

    # 4. grid + scratch accumulator (revisited output block)
    def k4(x_ref, o_ref, acc):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc[:] = jnp.zeros_like(acc)
        acc[:] += jnp.sum(x_ref[:], axis=0, keepdims=True)

        @pl.when(step == jnp.int32(nsteps - 1))
        def _():
            o_ref[:] = acc[:]
    try_one("4 grid+scratch", pl.pallas_call(
        k4, grid=(nsteps,),
        in_specs=[pl.BlockSpec((TILE, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, S), jnp.float32)]), x2d)

    # 5. dot_general in kernel (no grid)
    def k5(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    a = rng.random((256, 128)).astype(np.float32)
    try_one("5 dot", pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32)),
        a, a)

    # 6. bf16 dot
    def k6(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    ab = a.astype(jnp.bfloat16)
    try_one("6 bf16 dot", pl.pallas_call(
        k6, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32)),
        ab, ab)

    # 7. iota + compare one-hot + dot (no grid)
    def k7(seg_ref, v_ref, o_ref):
        s = seg_ref[:].reshape(TILE, 1)
        oh = (s == jax.lax.broadcasted_iota(jnp.int32, (TILE, G), 1)
              ).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            oh, v_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    try_one("7 onehot dot", pl.pallas_call(
        k7, out_shape=jax.ShapeDtypeStruct((G, S), jnp.float32)),
        seg[:TILE], vb[:TILE])

    # 8. 1-D input BlockSpec under grid
    def k8(seg_ref, o_ref):
        o_ref[:] = seg_ref[:] + jnp.int32(1)
    try_one("8 1-D blockspec+grid", pl.pallas_call(
        k8, grid=(nsteps,),
        in_specs=[pl.BlockSpec((TILE,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32)), seg)

    # 9. full combo at tiny size: grid + when + scratch + onehot dot
    def k9(seg_ref, v_ref, o_ref, acc):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc[:] = jnp.zeros_like(acc)
        s = seg_ref[:].reshape(TILE, 1)
        oh = (s == jax.lax.broadcasted_iota(jnp.int32, (TILE, G), 1)
              ).astype(jnp.bfloat16)
        acc[:] += jax.lax.dot_general(
            oh, v_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(step == jnp.int32(nsteps - 1))
        def _():
            o_ref[:] = acc[:]
    try_one("9 combo", pl.pallas_call(
        k9, grid=(nsteps,),
        in_specs=[pl.BlockSpec((TILE,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, S), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G, S), jnp.float32)]), seg, vb)


if __name__ == "__main__":
    main()
