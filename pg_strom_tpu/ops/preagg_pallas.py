"""Pallas fused one-hot matmul grouped reduction (the production kernel
behind ops/preagg_mxu.mxu_reduce on TPU).

The XLA formulation materializes the [N, G] one-hot in HBM (N*G*2 bytes:
8GB at 16M rows x G=256, 32GB at 4M x G=4096).  This kernel generates the
one-hot tile in VMEM on the fly — HBM traffic is exactly the V matrix —
and keeps the [G, S] accumulators on-chip:

  integer columns  bf16 dot -> f32 acc, flushed to an int32 (hi, lo) pair
                   every 65536 rows so partial sums stay < 2^24 (exact);
                   hosts reassemble hi*2^12 + lo -> int64
  shadow columns   f32 acc without flushing (threshold guards only; inf/nan
                   propagate and trigger the host-replay contract)

Measured (tools/pallas_proto.py, v5e): exact at 4M rows; G=1024 runs in
33ms where XLA would need an 8GB one-hot; G=256 ~26ms at S=128.

Reference parity: this is the gpupreagg device reduction
(opencl_gpupreagg.h:459-615) re-expressed as the systolic array's native
operation, with the workgroup-local accumulation replaced by VMEM-resident
[G, S] accumulators."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLUSH_ROWS = 1 << 16          # f32 partial sums stay < 2^24 (limb <= 255)
MAX_G = 1 << 11               # VMEM budget bound for on-chip accumulators


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_tile(G: int) -> int:
    t = max(512, min(4096, (4 << 20) // (2 * G)))
    return 1 << (t.bit_length() - 1)


@functools.lru_cache(maxsize=64)
def _build(N: int, G: int, S1: int, S2: int, TILE: int):
    nsteps = N // TILE
    flush_every = max(FLUSH_ROWS // TILE, 1)

    # x64-cleanliness (this tunnel's Mosaic service): every scalar op uses
    # explicit int32 — implicit python-int promotion under jax_enable_x64
    # RecursionErrors in the convert rule at trace time
    def kernel(seg_ref, vi_ref, vs_ref, hi_ref, lo_ref, sh_ref,
               acc, hi_acc, lo_acc, sh_acc):
        sb = pl.program_id(0)
        step = pl.program_id(1)

        @pl.when(step == jnp.int32(0))
        def _():
            acc[:] = jnp.zeros_like(acc)
            hi_acc[:] = jnp.zeros_like(hi_acc)
            lo_acc[:] = jnp.zeros_like(lo_acc)

        @pl.when((sb == jnp.int32(0)) & (step == jnp.int32(0)))
        def _():
            sh_acc[:] = jnp.zeros_like(sh_acc)

        # one-hot generated in VMEM (never touches HBM)
        seg = seg_ref[:].reshape(TILE, 1)
        oh = (seg == jax.lax.broadcasted_iota(jnp.int32, (TILE, G), 1)
              ).astype(jnp.bfloat16)
        acc[:] += jax.lax.dot_general(
            oh, vi_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(sb == jnp.int32(0))
        def _():
            sh_acc[:] += jax.lax.dot_general(
                oh, vs_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when((step % jnp.int32(flush_every)
                  == jnp.int32(flush_every - 1))
                 | (step == jnp.int32(nsteps - 1)))
        def _():
            t = acc[:].astype(jnp.int32)
            lo_acc[:] += t & jnp.int32(0xFFF)
            hi_acc[:] += t >> jnp.int32(12)
            acc[:] = jnp.zeros_like(acc)

        @pl.when(step == jnp.int32(nsteps - 1))
        def _():
            hi_ref[:] = hi_acc[:]
            lo_ref[:] = lo_acc[:]

            @pl.when(sb == jnp.int32(0))
            def _():
                sh_ref[:] = sh_acc[:]

    n_sblocks = S1 // 128
    # index maps write literal 0 as `sb * 0`: a literal constant in a
    # BlockSpec index map under jax_enable_x64 becomes an i64 scalar this
    # tunnel's Mosaic cannot legalize ("failed to legalize func.return",
    # HTTP 500) — tools/pallas_x64_bisect2.py isolates it
    return pl.pallas_call(
        kernel,
        grid=(n_sblocks, nsteps),
        in_specs=[
            pl.BlockSpec((TILE,), lambda sb, i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 128), lambda sb, i: (i, sb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, S2), lambda sb, i: (i, sb * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, 128), lambda sb, i: (i * 0, sb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda sb, i: (i * 0, sb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, S2), lambda sb, i: (i * 0, sb * 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((G, S1), jnp.int32),
                   jax.ShapeDtypeStruct((G, S1), jnp.int32),
                   jax.ShapeDtypeStruct((G, S2), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((G, 128), jnp.float32),
                        pltpu.VMEM((G, 128), jnp.int32),
                        pltpu.VMEM((G, 128), jnp.int32),
                        pltpu.VMEM((G, S2), jnp.float32)],
    )


def pallas_reduce(V: jnp.ndarray, seg_id: jnp.ndarray, G: int, n: int,
                  fsum_cols: list[int]):
    """Drop-in for the XLA one-hot reduce: (sums int64[G, S], fsums
    f64[G, len(fsum_cols)]).  V is the f32 column matrix from
    build_mxu_columns; seg_id == G drops a row."""
    S = V.shape[1]
    shadow = set(fsum_cols)
    int_cols = [c for c in range(S) if c not in shadow]
    TILE = pick_tile(G)

    pad_n = (-n) % TILE
    if pad_n:
        V = jnp.pad(V, ((0, pad_n), (0, 0)))
        seg_id = jnp.pad(seg_id, (0, pad_n), constant_values=G)
    N = n + pad_n

    S1 = _round_up(max(len(int_cols), 1), 128)
    S2 = _round_up(max(len(fsum_cols), 1), 128)
    icols = jnp.asarray(int_cols or [0], jnp.int32)
    scols = jnp.asarray(fsum_cols or [0], jnp.int32)
    Vi = jnp.zeros((N, S1), jnp.bfloat16).at[:, :len(int_cols) or 1].set(
        V[:, icols].astype(jnp.bfloat16))
    Vs = jnp.zeros((N, S2), jnp.bfloat16).at[:, :len(fsum_cols) or 1].set(
        V[:, scols].astype(jnp.bfloat16))

    hi, lo, sh = _build(N, G, S1, S2, TILE)(seg_id, Vi, Vs)
    ints = (hi.astype(jnp.int64) << 12) + lo.astype(jnp.int64)
    # place integer-column results back at their global column indexes
    sums = jnp.zeros((G, S), jnp.int64)
    if int_cols:
        sums = sums.at[:, icols].set(ints[:, :len(int_cols)])
    fsums = sh[:, :max(len(fsum_cols), 1)].astype(jnp.float64)
    if not fsum_cols:
        fsums = fsums[:, :0]
    return sums, fsums
