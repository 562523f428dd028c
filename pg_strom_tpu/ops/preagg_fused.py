"""Fused Pallas grouped-aggregation kernel: V-matrix build + one-hot matmul
in VMEM.

The XLA MXU strategy (ops/preagg_mxu.py) materializes the N x S bf16 limb
matrix in HBM before the one-hot dot; measured on v5e that materialization
is ~80% of the flagship chunk time (tools/bench_vbuild.py: 40ms of 44ms at
16M rows).  This kernel reads the per-slot *source lanes* (u32 limb words,
f32 magnitude lanes, bool ok lanes — a few hundred MB) and builds each
(TILE, 128) column tile in VMEM, so the limb matrix never exists in HBM:

    per tile:  limbs/digits (VPU)  ->  V tile (VMEM, bf16)
               one-hot(seg tile)   ->  (TILE, G) bf16 (VMEM)
               acc[G, 128] += oh^T @ V   (MXU, f32)

    Derived-lane encode: the key-square limb blocks (b^2/ab/a^2 from the
    biased key word) and the float signed-digit/|.| pair (from one signed
    lane) are computed IN-KERNEL rather than as XLA-encoded HBM lanes —
    5 of the flagship's 13 input lanes never touch HBM.  Float sums use
    SIGNED digits (digit(|x|)*sign(x) in [-255, 255], exact in bf16): one
    digit block instead of a pos/neg pair.
    every 64k rows: flush acc into int32 (hi, lo) pairs — signed f32
    partial sums stay within +-2^24 so integer columns are EXACT (the
    hi/lo split uses arithmetic shift + non-negative low bits, exact for
    negatives); shadow lanes accumulate in a separate f32 accumulator
    (threshold guards; inf/nan propagate).

Output contract is bit-compatible with preagg_mxu: the XLA epilogue maps
physical kernel columns onto the mxu_recipes layout ((G, S) int64 sums +
shadow fsums), so mxu_host_groups / mxu_extract_slot / mxu_absorb run
unchanged.  Key sumsq avoids 64-bit device math by decomposing
kb^2 = a^2*2^32 + ab*2^17 + b^2 (kb = a*2^16 + b) into three u32 limb
blocks the epilogue recombines at the right limb positions.

Supported slot kinds: nrows / count / sum_i / sumsq_i / sum_f + every f64
double-float kind (float8 sums, stddev/var/corr/covar families) + the key
constancy (Cauchy-Schwarz) blocks.  An f64 quantity rides as TWO signed f32
lanes (head = f32(q), tail = f32(q - head), XLA-encoded) that each get a
signed digit block in-kernel — f64 math never enters the kernel.  Plans
wider than the 128-lane accumulator fall back to the XLA MXU path.

x64-cleanliness (this tunnel's Mosaic service): explicit jnp.int32/uint32
scalars everywhere; BlockSpec index maps write `i * 0`, never a literal 0
(tools/pallas_x64_bisect2.py: a literal becomes an i64 scalar Mosaic fails
to legalize).

Reference parity: the gpupreagg preparation+reduction pipeline
(opencl_gpupreagg.h:380-615) as a single fused systolic-array kernel.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sqltypes import T
from .preagg_mxu import (F4_LIMBS, _kind_mxu_ok, _f4_scale_exp,
                         _f64_quantity, mxu_recipes, mxu_shadow_cols,
                         _KEY_WIDE_TYPES, _F64_KINDS)

FLUSH_ROWS = 1 << 16           # f32 partial sums of 8-bit limbs stay < 2^24
MAX_G = 1 << 11
LANES = 128                    # kernel accumulator width (one MXU block)

_FUSED_KINDS = ({"nrows", "count", "sum_i", "sumsq_i", "sum_f"}
                | _F64_KINDS)


def fused_supported(key_types: Sequence[T], aggs, arg_types) -> bool:
    """True when every MXU-eligible slot kind of the plan is fusable.

    Kinds outside the MXU set (min/max/numeric) run their scatter side-path
    either way; an MXU-eligible kind we can't fuse means the whole chunk
    should use the XLA MXU formulation so the recipe layout stays
    consistent."""
    if not key_types:
        return False
    for inst, at in zip(aggs, arg_types):
        a_t = at[0] if at else None
        for kind in inst.slots:
            if not _kind_mxu_ok(kind, a_t):
                continue                       # scatter side-path, fine
            if kind not in _FUSED_KINDS:
                return False
    return True


# ---------------------------------------------------------------------------
# plan: static description of kernel inputs + physical columns + epilogue map
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class _Plan:
    # ops: tuple of (opcode, input_index[, f4_slot_no])
    #   "mask"   -> 1 col   (seg != G)
    #   "bool"   -> 1 col   (bool lane & mask)
    #   "limbs4" -> 4 cols  (u32 lane, already masked/encoded by XLA)
    #   "ksq12"  -> 12 cols (b^2, a*b, a^2 limb blocks derived IN-KERNEL from
    #                        the biased key word kb = a*2^16 + b — saves three
    #                        encoded u32 lanes of HBM traffic per key)
    #   "f4s"    -> F4_LIMBS cols (SIGNED digit block digit(|x|)*sign(x)
    #                        derived IN-KERNEL from one signed masked f32
    #                        lane; signed digits in [-255, 255] are exact in
    #                        bf16 and keep f32 partial sums < 2^24)
    #   "fabs"   -> 1 col   (|lane| bf16 shadow, derived in-kernel)
    #   "f32"    -> 1 col   (masked f32 lane, bf16-quantized shadow)
    ops: tuple
    n_inputs: int
    n_f4: int
    ncols: int                 # physical columns (<= LANES)
    # epilogue: (recipe_col, phys_col, int multiplier) for integer sums
    int_map: tuple
    # (recipe_shadow_col, phys_col) pairs, recipe order = mxu_shadow_cols
    shadow_map: tuple


def _build_plan(key_types: Sequence[T], aggs, arg_types,
                dense_key: bool = False):
    keyr, slotr, S = mxu_recipes(key_types, aggs, arg_types,
                                 dense_key=dense_key)
    ops: list = []
    int_map: list = []
    shadow_map: list = []
    n_in = 0
    n_f4 = 0
    col = 0

    def new_in() -> int:
        nonlocal n_in
        n_in += 1
        return n_in - 1

    def emit(op) -> int:
        nonlocal col
        ops.append(op)
        k = {"mask": 1, "bool": 1, "limbs4": 4, "ksq12": 12,
             "f4s": F4_LIMBS, "fabs": 1, "f32": 1}[op[0]]
        c = col
        col += k
        return c

    # col 0: bucket row count (mask) — recipe col 0
    int_map.append((0, emit(("mask",)), 1))

    def emit_key_word(kb: int, sum_limbs, sumsq_limbs) -> None:
        c = emit(("limbs4", kb))
        for j in range(4):
            int_map.append((sum_limbs[j], c + j, 1))
        # kb^2 = a^2*2^32 + ab*2^17 + b^2   (2^17 = 2 * 2^16 -> limb 2, x2);
        # the b^2 / a*b / a^2 limb blocks are derived in-kernel from kb
        c = emit(("ksq12", kb))
        for j in range(4):
            int_map.append((sumsq_limbs[j], c + j, 1))
        for j in range(4):
            int_map.append((sumsq_limbs[j + 2], c + 4 + j, 2))
        for j in range(4):
            int_map.append((sumsq_limbs[j + 4], c + 8 + j, 1))

    for kr in keyr:
        emit_key_word(new_in(), kr.sum_limbs, kr.sumsq_limbs)
        if kr.sum_limbs_hi:        # 64-bit key: hi-word block
            emit_key_word(new_in(), kr.sum_limbs_hi, kr.sumsq_limbs_hi)
        int_map.append((kr.nval, emit(("bool", new_in())), 1))

    for inst, at, rd in zip(aggs, arg_types, slotr):
        for kind, r in rd.items():
            if kind in ("nrows", "count"):
                i = new_in()       # bool ok lane (mask applied in kernel)
                int_map.append((r.limbs[0], emit(("bool", i)), 1))
            elif kind == "sum_i":
                lo, hi = new_in(), new_in()
                c = emit(("limbs4", lo))
                for j in range(4):
                    int_map.append((r.limbs[j], c + j, 1))
                c = emit(("limbs4", hi))
                for j in range(4):
                    int_map.append((r.limbs[j + 4], c + j, 1))
                okc = new_in()
                int_map.append((r.okcnt, emit(("bool", okc)), 1))
                sh = new_in()      # |v| f32, masked by XLA
                shadow_map.append((r.shadow, emit(("f32", sh))))
            elif kind == "sumsq_i":
                lo, hi = new_in(), new_in()
                c = emit(("limbs4", lo))
                for j in range(4):
                    int_map.append((r.limbs[j], c + j, 1))
                c = emit(("limbs4", hi))
                for j in range(4):
                    int_map.append((r.limbs[j + 4], c + j, 1))
            elif kind == "sum_f" and not r.lo_limbs:
                v = new_in()       # ONE signed masked f32 lane; the kernel
                c = emit(("f4s", v, n_f4))   # derives the signed digit block
                for j in range(F4_LIMBS):
                    int_map.append((r.limbs[j], c + j, 1))
                shadow_map.append((r.shadow, emit(("fabs", v))))
                n_f4 += 1
            elif r.lo_limbs:
                # f64 double-float: head + tail signed f32 lanes, one signed
                # digit block each; shadow = |head| (inf/nan replay guard)
                hi_, lo_ = new_in(), new_in()
                c = emit(("f4s", hi_, n_f4))
                for j in range(F4_LIMBS):
                    int_map.append((r.limbs[j], c + j, 1))
                c = emit(("f4s", lo_, n_f4 + 1))
                for j in range(F4_LIMBS):
                    int_map.append((r.lo_limbs[j], c + j, 1))
                shadow_map.append((r.shadow, emit(("fabs", hi_))))
                n_f4 += 2
            else:                  # pragma: no cover — fused_supported gates
                raise ValueError(kind)

    if col > LANES:
        return None, S
    shadow_map.sort(key=lambda p: p[0])
    return _Plan(ops=tuple(ops), n_inputs=n_in, n_f4=n_f4, ncols=col,
                 int_map=tuple(int_map), shadow_map=tuple(shadow_map)), S


@functools.lru_cache(maxsize=256)
def _plan_cached(key_types: tuple, slots_sig: tuple, arg_types: tuple,
                 f64on: bool, dense_key: bool = False):
    # f64on keys the cache only: _kind_mxu_ok consults the live setting,
    # so a plan built under one f64-blocks state must not be reused by the
    # other (the recipe layouts differ)
    class _Inst:                      # minimal view for mxu_recipes
        def __init__(self, slots):
            self.slots = slots
    aggs = [_Inst(list(s)) for s in slots_sig]
    return _build_plan(list(key_types), aggs, list(arg_types),
                       dense_key=dense_key)


def _pick_tile(G: int, n: int) -> int:
    """Rows per grid step.  Bigger tiles amortize per-step VPU overheads
    (measured on v5e, G=256: TILE 2048 -> 18.9ms/16M rows, 16384 -> 14.3ms);
    the ceiling is the (G, TILE) bf16 one-hot staying ~<= 8MB of VMEM, and
    TILE <= 32768 keeps every flush window within FLUSH_ROWS rows so f32
    integer accumulation stays exact."""
    t = max(2048, min(32768, (4 << 21) // G))
    t = 1 << (t.bit_length() - 1)
    while t > 2048 and t > max(n, 1):
        t >>= 1
    return t


def _pick_pack(G: int, K: int) -> int:
    """Block-packing factor P: rows packed per MXU contraction column.

    The MXU streams one 128-value column per cycle; a (G, TILE) x (TILE, K)
    one-hot dot with G, K < 128 wastes most of each column.  Packing P rows
    block-diagonally (row r_p's one-hot at sublanes [G*p, G*p+G), its value
    limbs at lanes [K*p, K*p+K)) cuts MXU cycles P-fold; the unwanted cross
    blocks land in accumulator cells the epilogue never reads, so the packed
    result is bit-exact (measured: tools/probe_blockpack.py `exact=True`,
    tools/probe_densepack.py 10.2 Grows/s vs 2.6 unpacked at 67M rows)."""
    P = 8
    sg = -(-G * P // LANES)
    sk = -(-K * P // LANES)
    # MXU cycles per TILE elements: sg*sk*TILE/P packed vs TILE unpacked —
    # pack only when the split product still wins >= 2x.  P is FIXED at 8:
    # 8-sublane-aligned strided copies are the one packed construction
    # Mosaic lowers without relayouts (measured: P=4 strided concat ran
    # SLOWER than unpacked; see tools/probe_densepack.py for the fast P=8)
    return P if sg * sk * 2 <= P else 1


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _build_kernel(plan: _Plan, N: int, G: int, TILE: int, P: int):
    # interpret (CPU) vs compiled (TPU) must not share cache entries
    return _build_kernel_impl(plan, N, G, TILE, P,
                              jax.default_backend() == "cpu")


@functools.lru_cache(maxsize=128)
def _build_kernel_impl(plan: _Plan, N: int, G: int, TILE: int, P: int,
                       interpret: bool):
    """Block-packed fused kernel.

    P rows ride each MXU contraction column (see _pick_pack): the tile's
    TILE elements arrive as (P, T4) blocks (T4 = TILE//P, every VPU vreg
    sublane-dense), element (p, t)'s one-hot occupies strided row g*P+p of
    oht and its value limbs occupy strided rows col*P+p of Vt, so one
    (G*P, T4) x (K*P->LANES, T4) dot does P rows' worth of grouping per
    MXU cycle.  Cross terms (p != q) land in acc cells the epilogue's
    strided-diagonal read skips — bit-exact (tools/probe_blockpack.py).
    P=1 degenerates to the original unpacked layout."""
    nsteps = N // TILE
    T4 = TILE // P
    GP = G * P
    flush_every = max(FLUSH_ROWS // TILE, 1)
    K = plan.ncols
    # packed V wider than one MXU block: split the dot into ceil-128 row
    # chunks on both operands (cross products accumulate into disjoint acc
    # block columns; the strided-diagonal epilogue reads through SKL)
    SK = 1 if P == 1 else -(-K * P // LANES)
    SKL = SK * LANES
    nsc = max(plan.n_f4, 1)

    def rep(x, k):
        """k block-strided copies: row r of the result = x[r % P], so the
        op/limb index of row r is r // P (dense VPU copy, no relayout)."""
        return x if k == 1 else jnp.concatenate([x] * k, axis=0)

    def limb_iota(dtype, k, mod=None):
        """Per-row limb index (r // P), optionally % mod, as a shift base."""
        it = jax.lax.broadcasted_iota(dtype, (k * P, T4), 0) // dtype(P)
        return it if mod is None else it % dtype(mod)

    def kernel(*refs):
        seg_ref = refs[0]
        in_refs = refs[1:1 + plan.n_inputs]
        sc_ref = refs[1 + plan.n_inputs]
        hi_ref, lo_ref, sh_ref = refs[2 + plan.n_inputs:5 + plan.n_inputs]
        acc, hi_acc, lo_acc, sh_acc = refs[5 + plan.n_inputs:]
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc[:] = jnp.zeros_like(acc)
            hi_acc[:] = jnp.zeros_like(hi_acc)
            lo_acc[:] = jnp.zeros_like(lo_acc)
            sh_acc[:] = jnp.zeros_like(sh_acc)

        # TRANSPOSED build: every computed column lives as P-strided
        # (.., T4) rows (lane dim = T4 — the natural TPU vector layout; a
        # (TILE, 1) column block pads to 128 lanes and OOMs VMEM 128x).
        # Lanes arrive pre-shaped (P, T4) in their integer/float dtype
        # (bf16 1-D reshapes are the one case Mosaic rejects).
        seg = seg_ref[:].reshape(P, T4) if P == 1 else seg_ref[:]
        mask = seg < jnp.int32(G)

        def rd(ref):
            # P=1: 1-D (TILE,) lane block -> (1, TILE); P=8: the BlockSpec
            # already delivers (8, T4) — no in-kernel relayout
            return ref[:].reshape(P, T4) if P == 1 else ref[:]

        rows: list = []
        for op in plan.ops:
            if op[0] == "mask":
                rows.append(mask.astype(jnp.bfloat16))
            elif op[0] == "bool":
                b = rd(in_refs[op[1]]) & mask
                rows.append(b.astype(jnp.bfloat16))
            elif op[0] == "limbs4":
                u = rep(rd(in_refs[op[1]]), 4)     # (4P, T4) uint32
                sh = limb_iota(jnp.uint32, 4) * jnp.uint32(8)
                # Mosaic has no u32->bf16 cast; limbs are <= 255 so i32 is
                # an exact intermediate
                rows.append(((u >> sh) & jnp.uint32(0xFF))
                            .astype(jnp.int32).astype(jnp.bfloat16))
            elif op[0] == "ksq12":
                # b^2, a*b, a^2 limb blocks from kb = a*2^16 + b; u32
                # multiplies wrap exactly like the XLA encode did
                u = rd(in_refs[op[1]])
                a = u >> jnp.uint32(16)
                b = u & jnp.uint32(0xFFFF)
                sh = limb_iota(jnp.uint32, 4) * jnp.uint32(8)
                for sq in (b * b, a * b, a * a):
                    rows.append(((rep(sq, 4) >> sh) & jnp.uint32(0xFF))
                                .astype(jnp.int32).astype(jnp.bfloat16))
            elif op[0] == "f4s":
                # SIGNED magnitude digit block from one signed lane:
                # digit(|x|) * sign(x).  where() not abs(): NaN rows must
                # contribute 0 digits (the fabs shadow carries the NaN to
                # the host-replay guard).
                # Two-level extraction: three serial base-2^24 splits (each
                # exact in f32: w < 2^24 has its fractional suffix exactly
                # representable, so w - floor(w) is exact), then ONE
                # vectorized (9P, T4) shift/mask for the 8-bit digits —
                # replaces the 9-step serial digit chain on 1-sublane rows.
                x = rd(in_refs[op[1]])
                sc = sc_ref[0, op[2]]          # static indices (not traced)
                zero = jnp.float32(0.0)
                pos = jnp.where(x > zero, x, zero)
                neg = jnp.where(x < zero, -x, zero)
                sgn = jnp.where(x < zero, jnp.float32(-1.0),
                                jnp.float32(1.0))
                v = (pos + neg) * sc           # in [0, 1)
                assert F4_LIMBS == 9           # 72-bit window = 3 x 24
                p24 = jnp.float32(1 << 24)
                ints = []
                for _ in range(3):
                    w = v * p24
                    i_ = jnp.floor(w)
                    v = w - i_
                    ints.append(i_.astype(jnp.int32))
                # low level first; within a level digit shifts 0/8/16
                rows9 = jnp.concatenate(
                    [rep(t, 3) for t in reversed(ints)], axis=0)
                sh = limb_iota(jnp.int32, 9, mod=3) * jnp.int32(8)
                digits = (rows9 >> sh) & jnp.int32(0xFF)
                rows.append((digits.astype(jnp.float32) * rep(sgn, 9))
                            .astype(jnp.bfloat16))
            elif op[0] == "fabs":
                rows.append(jnp.abs(rd(in_refs[op[1]])).astype(jnp.bfloat16))
            else:                      # "f32" shadow lane
                rows.append(rd(in_refs[op[1]]).astype(jnp.bfloat16))
        if K * P < SKL:
            rows.append(jnp.zeros((SKL - K * P, T4), jnp.bfloat16))
        Vt = jnp.concatenate(rows, axis=0)     # (SKL, T4)

        oht = (rep(seg, G) == limb_iota(jnp.int32, G)
               ).astype(jnp.bfloat16)          # (GP, T4)
        if P == 1:
            acc[:] += jax.lax.dot_general(
                oht, Vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            # split dots: 128-row chunks of both operands; each (sg, sk)
            # product lands in its own acc block
            for sg in range(-(-GP // LANES)):
                g0 = sg * LANES
                h = min(LANES, GP - g0)
                oh_sg = oht[g0:g0 + h]
                for sk in range(SK):
                    k0 = sk * LANES
                    acc[g0:g0 + h, k0:k0 + LANES] += jax.lax.dot_general(
                        oh_sg, Vt[k0:k0 + LANES], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)

        @pl.when((step % jnp.int32(flush_every)
                  == jnp.int32(flush_every - 1))
                 | (step == jnp.int32(nsteps - 1)))
        def _():
            a = acc[:]
            sh_acc[:] += a            # shadow lanes; int lanes unused there
            t = a.astype(jnp.int32)   # int lanes; shadow lanes unused there
            lo_acc[:] += t & jnp.int32(0xFFF)
            hi_acc[:] += t >> jnp.int32(12)
            acc[:] = jnp.zeros_like(acc)

        @pl.when(step == jnp.int32(nsteps - 1))
        def _():
            hi_ref[:] = hi_acc[:]
            lo_ref[:] = lo_acc[:]
            sh_ref[:] = sh_acc[:]

    if P == 1:
        # 1-D (TILE,) lane blocks, reshaped to (1, TILE) rows in-kernel
        lane_spec = pl.BlockSpec((TILE,), lambda i: (i,),
                                 memory_space=pltpu.VMEM)
    else:
        # P=8: lanes arrive pre-shaped (N/T4, T4); the (8, T4) block is
        # sublane-divisible (Mosaic's 2-D rule) AND contiguous per step —
        # every VPU op runs 8/8 sublane-dense with no in-kernel relayout
        # (the probe_densepack layout, 10.2 Grows/s at 67M rows)
        lane_spec = pl.BlockSpec((P, T4), lambda i: (i, i * 0),
                                 memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((GP, SKL), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    # CPU (tests / no-TPU): interpret mode executes the same kernel in
    # python semantics — exactness tests run without a chip
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        interpret=interpret,
        in_specs=([lane_spec] * (1 + plan.n_inputs)
                  + [pl.BlockSpec((1, nsc), lambda i: (i * 0, i * 0),
                                  memory_space=pltpu.VMEM)]),
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((GP, SKL), jnp.int32),
                   jax.ShapeDtypeStruct((GP, SKL), jnp.int32),
                   jax.ShapeDtypeStruct((GP, SKL), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((GP, SKL), jnp.float32),
                        pltpu.VMEM((GP, SKL), jnp.int32),
                        pltpu.VMEM((GP, SKL), jnp.int32),
                        pltpu.VMEM((GP, SKL), jnp.float32)],
    )


# ---------------------------------------------------------------------------
# XLA side: lane encoding + kernel call + epilogue into the mxu layout
# ---------------------------------------------------------------------------

def _u64_split(u: jnp.ndarray):
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    return lo, hi


def fused_mxu_reduce(key_vals, aggs, arg_vals, mask: jnp.ndarray,
                     seg_id: jnp.ndarray, G: int, n: int,
                     key_types, arg_types, dense_key: bool = False):
    """Drop-in for build_mxu_columns + mxu_reduce on TPU.

    Returns (sums int64[G, S], fsums f64[G, n_shadow], f4exps) with the
    exact preagg_mxu output contract, or None when the plan can't fuse."""
    from .preagg_mxu import _f64_blocks_enabled
    plan, S = _plan_cached(tuple(key_types),
                           tuple(tuple(i.slots) for i in aggs),
                           tuple(arg_types), _f64_blocks_enabled(),
                           dense_key)
    if plan is None:
        return None

    inputs: list = [None] * plan.n_inputs
    f4_exps: list = []
    scales: list = []
    ii = 0

    def put(v):
        nonlocal ii
        inputs[ii] = v
        ii += 1

    for k in [] if dense_key else key_vals:
        okk = mask & k.valid
        if k.t in _KEY_WIDE_TYPES:
            # 64-bit key: biased word pair, squares derived in-kernel
            u = (k.data.astype(jnp.int64).astype(jnp.uint64)
                 ^ jnp.uint64(1 << 63))
            u = jnp.where(okk, u, jnp.uint64(0))
            put((u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))
            put((u >> jnp.uint64(32)).astype(jnp.uint32))
            put(okk)
            continue
        kb = (jax.lax.bitcast_convert_type(k.data.astype(jnp.int32),
                                           jnp.uint32)
              ^ jnp.uint32(0x80000000))
        kb = jnp.where(okk, kb, jnp.uint32(0))
        put(kb); put(okk)     # a^2/ab/b^2 limb blocks derived in-kernel

    for inst, vals in zip(aggs, arg_vals):
        a_ = vals[0] if vals else None
        ok = mask if a_ is None else (mask & a_.valid)
        if len(vals) == 2:
            ok = mask & vals[0].valid & vals[1].valid
        for kind in inst.slots:
            if not _kind_mxu_ok(kind, a_.t if a_ is not None else None):
                continue
            if kind in ("nrows", "count"):
                put(mask if kind == "nrows" else ok)
            elif kind == "sum_i":
                v = jnp.where(ok, a_.data.astype(jnp.int64), jnp.int64(0))
                lo, hi = _u64_split(jnp.where(
                    ok, v.astype(jnp.uint64) + jnp.uint64(1 << 63),
                    jnp.uint64(0)))
                put(lo); put(hi); put(ok)
                put(jnp.where(ok, jnp.abs(a_.data.astype(jnp.float32)),
                              jnp.float32(0.0)))
            elif kind == "sumsq_i":
                v = jnp.where(ok, a_.data.astype(jnp.int64), jnp.int64(0))
                lo, hi = _u64_split((v * v).astype(jnp.uint64))
                put(lo); put(hi)
            elif kind == "sum_f" and a_.t is T.FLOAT4:
                absx = jnp.where(ok, jnp.abs(a_.data.astype(jnp.float32)),
                                 jnp.float32(0.0))
                absx = jnp.where(jnp.isnan(absx), jnp.float32(0.0), absx)
                sc, e = _f4_scale_exp(absx)
                f4_exps.append(e)
                scales.append(sc)
                # ONE signed masked lane; the kernel derives the signed
                # digit block and the |.| shadow from it (3 HBM lanes -> 1)
                put(jnp.where(ok, a_.data.astype(jnp.float32),
                              jnp.float32(0.0)))
            else:
                # f64 double-float: encode head/tail f32 lanes in XLA (the
                # only f64 math — two element-wise casts), digits in-kernel
                q = _f64_quantity(kind, vals, ok)
                hi64 = q.astype(jnp.float32)
                lo64 = (q - hi64.astype(jnp.float64)).astype(jnp.float32)
                for lane in (hi64, lo64):
                    absx = jnp.where(jnp.isnan(lane), jnp.float32(0.0),
                                     jnp.abs(lane))
                    sc, e = _f4_scale_exp(absx)
                    f4_exps.append(e)
                    scales.append(sc)
                    put(lane)
    assert ii == plan.n_inputs

    TILE = _pick_tile(G, n)
    P = _pick_pack(G, plan.ncols)
    pad = (-n) % TILE
    if pad:
        seg_id = jnp.pad(seg_id, (0, pad), constant_values=G)
        inputs = [jnp.pad(v, (0, pad)) for v in inputs]
    N = n + pad
    sc_arr = (jnp.stack(scales).reshape(1, -1) if scales
              else jnp.zeros((1, 1), jnp.float32))

    if P == 1:
        kin = (seg_id,) + tuple(inputs)
    else:
        # lanes pre-shaped (N/T4, T4): contiguous TILE elements per (8, T4)
        # block — a free row-major reshape, not the (P, N/P) striping
        T4 = TILE // P
        kin = tuple(v.reshape(-1, T4) for v in (seg_id,) + tuple(inputs))
    hi, lo, sh = _build_kernel(plan, N, G, TILE, P)(*kin, sc_arr)
    full = (hi.astype(jnp.int64) << 12) + lo.astype(jnp.int64)
    if P == 1:
        ints = full
        sh_g = sh
    else:
        # strided diagonal: wanted sums live at [g*P+p, c*P+p]; cross blocks
        # (p != q) are garbage the reshape/diagonal skips
        SKL = full.shape[1]
        a4 = full.reshape(G, P, SKL // P, P)
        ints = jnp.sum(jnp.diagonal(a4, axis1=1, axis2=3), axis=-1)
        s4 = sh.reshape(G, P, SKL // P, P)
        sh_g = jnp.sum(jnp.diagonal(s4, axis1=1, axis2=3)
                       .astype(jnp.float64), axis=-1)

    sums = jnp.zeros((G, S), jnp.int64)
    # group epilogue adds by (recipe column, multiplier) so each scatter-add
    # is one vectorized .at[].add
    by_mult: dict = {}
    for rc, pc, m in plan.int_map:
        by_mult.setdefault(m, []).append((rc, pc))
    for m, pairs in by_mult.items():
        rcs = np.asarray([p[0] for p in pairs], np.int32)
        pcs = np.asarray([p[1] for p in pairs], np.int32)
        sums = sums.at[:, rcs].add(ints[:, pcs] * jnp.int64(m))

    sh_cols = mxu_shadow_cols([
        d for d in _recipes_slotr(key_types, aggs, arg_types, dense_key)])
    if plan.shadow_map:
        assert [rc for rc, _ in plan.shadow_map] == sh_cols
        pcs = np.asarray([pc for _, pc in plan.shadow_map], np.int32)
        fsums = sh_g[:, pcs].astype(jnp.float64)
    else:
        fsums = jnp.zeros((G, 0), jnp.float64)

    exps = (jnp.stack(f4_exps) if f4_exps else jnp.zeros(0, jnp.int32))
    return sums, fsums, exps


def _recipes_slotr(key_types, aggs, arg_types, dense_key: bool = False):
    _, slotr, _ = mxu_recipes(list(key_types), aggs, list(arg_types),
                              dense_key=dense_key)
    return slotr
