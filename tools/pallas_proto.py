"""Pallas fused one-hot matmul grouped-reduction prototype.

The XLA formulation materializes the [N, G] one-hot in HBM (N*G*2 bytes —
32GB at 4M rows x G=4096).  This kernel generates the one-hot per tile in
VMEM and accumulates [G, S] on-chip, so HBM traffic is just the V matrix.

python tools/pallas_proto.py <variant> [N] [G] [S]
variants: int8 | bf16 | xla
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_int8(N, G, S, TILE):
    """int8 one-hot x int8 nibble-limbs -> exact int32 accumulation
    (no flushing: limb<=15 * N<=2^27 rows < 2^31)."""
    nsteps = N // TILE

    def kernel(seg_ref, v_ref, out_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # one-hot TRANSPOSED ([G, TILE]) so the dot is the canonical
        # A[M,K] @ B[K,N] orientation the MXU wants
        seg = seg_ref[:].reshape(1, TILE)
        oht = (seg == jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 0)
               ).astype(jnp.int8)
        acc_ref[:] += jax.lax.dot_general(
            oht, v_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(step == jnp.int32(nsteps - 1))
        def _():
            out_ref[:] = acc_ref[:]

    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, S), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, S), jnp.int32),
        scratch_shapes=[pltpu.VMEM((G, S), jnp.int32)],
    )


def make_bf16(N, G, S, TILE, FLUSH_ROWS=1 << 16):
    """bf16 one-hot x bf16 byte-limbs -> f32 acc, flushed to an int32
    hi/lo pair every FLUSH_ROWS rows (f32 partial sums stay < 2^24)."""
    nsteps = N // TILE
    flush_every = max(FLUSH_ROWS // TILE, 1)

    def kernel(seg_ref, v_ref, hi_ref, lo_ref, acc_ref, hi_acc, lo_acc):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            hi_acc[:] = jnp.zeros_like(hi_acc)
            lo_acc[:] = jnp.zeros_like(lo_acc)

        seg = seg_ref[:].reshape(TILE, 1)
        oh = (seg == jax.lax.broadcasted_iota(jnp.int32, (TILE, G), 1)
              ).astype(jnp.bfloat16)
        acc_ref[:] += jax.lax.dot_general(
            oh, v_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        # x64-clean: explicit int32 everywhere — implicit python-int
        # promotion inside a Pallas trace under jax_enable_x64 hits a
        # RecursionError in the convert rule (the whole "Pallas+x64 broken"
        # story reduces to this)
        @pl.when((step % jnp.int32(flush_every) == jnp.int32(flush_every - 1))
                 | (step == jnp.int32(nsteps - 1)))
        def _():
            t = acc_ref[:].astype(jnp.int32)
            lo_acc[:] += t & jnp.int32(0xFFF)
            hi_acc[:] += t >> jnp.int32(12)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(step == jnp.int32(nsteps - 1))
        def _():
            hi_ref[:] = hi_acc[:]
            lo_ref[:] = lo_acc[:]

    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((G, S), jnp.int32),
                   jax.ShapeDtypeStruct((G, S), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((G, S), jnp.float32),
                        pltpu.VMEM((G, S), jnp.int32),
                        pltpu.VMEM((G, S), jnp.int32)],
    )


def main():
    variant = sys.argv[1]
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 24
    G = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    S = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    rng = np.random.default_rng(0)
    seg_np = rng.integers(0, G, N).astype(np.int32)
    budget = 6 * (1 << 20)
    TILE = max(512, min(8192, budget // (G * 2)))
    TILE = 1 << (TILE.bit_length() - 1)
    if len(sys.argv) > 5:
        TILE = int(sys.argv[5])
    print(f"# TILE={TILE} steps={N // TILE}")

    if variant == "int8":
        v_np = rng.integers(0, 16, (N, S)).astype(np.int8)
        fn = jax.jit(make_int8(N, G, S, TILE))
    elif variant == "bf16":
        v_np = rng.integers(0, 256, (N, S)).astype(jnp.bfloat16)
        fn = jax.jit(make_bf16(N, G, S, TILE))
    else:
        v_np = rng.integers(0, 256, (N, S)).astype(jnp.bfloat16)
        SEG = 1 << 16
        nseg = N // SEG

        def xla(seg, v):
            oh = jax.nn.one_hot(seg.reshape(nseg, SEG), G, dtype=jnp.bfloat16)
            part = jax.lax.dot_general(
                oh, v.reshape(nseg, SEG, S), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return jnp.sum(part.astype(jnp.int64), axis=0)
        fn = jax.jit(xla)

    seg = jax.device_put(seg_np)
    v = jax.device_put(v_np)
    t0 = time.perf_counter()
    out = fn(seg, v)
    first = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"# compile+first {time.perf_counter()-t0:.1f}s")

    # correctness vs numpy (first 3 groups, first 4 cols)
    want = np.zeros((G, S), np.int64)
    np.add.at(want, seg_np, v_np.astype(np.int64))
    if variant == "int8":
        got = np.asarray(out).astype(np.int64)
    elif variant == "bf16":
        hi, lo = out
        got = (np.asarray(hi).astype(np.int64) << 12) + np.asarray(lo)
    else:
        got = np.asarray(out)
    ok = np.array_equal(got, want)
    print(f"# exact={ok}")

    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(seg, v))
        best = min(best, time.perf_counter() - t0)
    print(f"{variant:5s} N={N} G={G} S={S}: {best*1e3:8.2f} ms "
          f"{N/best/1e6:9.1f} Mrows/s exact={ok}")


if __name__ == "__main__":
    main()
