"""Bisect which kernel feature triggers the Mosaic convert-rule recursion.

python tools/pallas_bisect.py <variant>
variants: base | grid2d | shadow | nestedwhen | full
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, G, S, TILE = 1 << 20, 256, 128, 4096
nsteps = N // TILE
flush_every = 16


def build(variant):
    grid2d = variant in ("grid2d", "shadow", "nestedwhen", "full")
    shadow = variant in ("shadow", "nestedwhen", "full")
    nested = variant in ("nestedwhen", "full")

    def kernel(*refs):
        if shadow:
            seg_ref, vi_ref, vs_ref, hi_ref, lo_ref, sh_ref, acc, hi_acc, lo_acc, sh_acc = refs
        else:
            seg_ref, vi_ref, hi_ref, lo_ref, acc, hi_acc, lo_acc = refs
        step = pl.program_id(1) if grid2d else pl.program_id(0)
        sb = pl.program_id(0) if grid2d else 0

        @pl.when(step == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            hi_acc[:] = jnp.zeros_like(hi_acc)
            lo_acc[:] = jnp.zeros_like(lo_acc)
            if shadow:
                sh_acc[:] = jnp.zeros_like(sh_acc)

        seg = seg_ref[:].reshape(TILE, 1)
        oh = (seg == jax.lax.broadcasted_iota(jnp.int32, (TILE, G), 1)
              ).astype(jnp.bfloat16)
        acc[:] += jax.lax.dot_general(
            oh, vi_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if shadow:
            sh_acc[:] += jax.lax.dot_general(
                oh, vs_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when((step % flush_every == flush_every - 1)
                 | (step == nsteps - 1))
        def _():
            t = acc[:].astype(jnp.int32)
            lo_acc[:] += t & 0xFFF
            hi_acc[:] += t >> 12
            acc[:] = jnp.zeros_like(acc)

        @pl.when(step == nsteps - 1)
        def _():
            hi_ref[:] = hi_acc[:]
            lo_ref[:] = lo_acc[:]
            if shadow and nested:
                @pl.when(sb == 0)
                def _():
                    sh_ref[:] = sh_acc[:]
            elif shadow:
                sh_ref[:] = sh_acc[:]

    grid = (1, nsteps) if grid2d else (nsteps,)
    if grid2d:
        seg_spec = pl.BlockSpec((TILE,), lambda sb, i: (i,),
                                memory_space=pltpu.VMEM)
        vi_spec = pl.BlockSpec((TILE, 128), lambda sb, i: (i, sb),
                               memory_space=pltpu.VMEM)
        vs_spec = pl.BlockSpec((TILE, 128), lambda sb, i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((G, 128), lambda sb, i: (0, sb),
                                memory_space=pltpu.VMEM)
        sh_spec = pl.BlockSpec((G, 128), lambda sb, i: (0, 0),
                               memory_space=pltpu.VMEM)
    else:
        seg_spec = pl.BlockSpec((TILE,), lambda i: (i,),
                                memory_space=pltpu.VMEM)
        vi_spec = pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        vs_spec = pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((G, 128), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        sh_spec = out_spec

    in_specs = [seg_spec, vi_spec] + ([vs_spec] if shadow else [])
    out_specs = (out_spec, out_spec) + ((sh_spec,) if shadow else ())
    out_shape = (jax.ShapeDtypeStruct((G, 128), jnp.int32),
                 jax.ShapeDtypeStruct((G, 128), jnp.int32))
    if shadow:
        out_shape = out_shape + (jax.ShapeDtypeStruct((G, 128), jnp.float32),)
    scratch = [pltpu.VMEM((G, 128), jnp.float32),
               pltpu.VMEM((G, 128), jnp.int32),
               pltpu.VMEM((G, 128), jnp.int32)]
    if shadow:
        scratch.append(pltpu.VMEM((G, 128), jnp.float32))
    return pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                          out_specs=out_specs, out_shape=out_shape,
                          scratch_shapes=scratch), shadow


def main():
    variant = sys.argv[1]
    rng = np.random.default_rng(0)
    seg = jnp.asarray(rng.integers(0, G, N).astype(np.int32))
    Vi = jnp.asarray(rng.integers(0, 256, (N, 128)).astype(jnp.bfloat16))
    fn, shadow = build(variant)
    args = (seg, Vi, Vi) if shadow else (seg, Vi)
    try:
        out = jax.jit(fn)(*args)
        hi, lo = np.asarray(out[0]).astype(np.int64), np.asarray(out[1])
        got = (hi << 12) + lo
        want = np.zeros((G, 128), np.int64)
        np.add.at(want, np.asarray(seg), np.asarray(Vi).astype(np.int64))
        print(f"{variant}: OK exact={np.array_equal(got, want)}")
    except RecursionError:
        print(f"{variant}: RECURSION")


if __name__ == "__main__":
    main()
