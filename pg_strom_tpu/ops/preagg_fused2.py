"""Fused preagg kernel v2: RAW column planes in, everything derived in VMEM.

Round-2 measurement (BASELINE.md truth #9 + tools/probe_v2.py): the v1 fused
kernel (ops/preagg_fused.py) is VPU-bound on V-build AND pays a whole XLA
encode pass of HBM traffic writing masked/biased lanes before the kernel
reads them back.  v2 removes the encode pass: the kernel reads the columns'
RAW storage planes (the same device-resident planes every other executor
shares in the tcache) and derives mask / bucket ids / limbs / digits in
VMEM.  Measured on v5e at the flagship shape (2^26 rows, G=32,
`SELECT key, sum(x), count(x), sum(y) WHERE x > .25 GROUP BY key`):
11.36 ms vs 26.94 ms for v1 — 2.4x, bit-exact.

What makes it possible:

* **Column statistics as plan parameters** (datastore.column_stats — exact
  min/max per immutable column version).  Integer sums encode v' = v - min:
  the limb count shrinks to ceil(bits(max-min)/8) (5 limbs for a 40-bit
  range instead of 8 + bias handling), extraction adds min*okcnt back in
  exact host big-int arithmetic, and overflow is IMPOSSIBLE (the limb sums
  reconstruct the true sum with no modular wrap), so the sum_i shadow lane
  disappears.  The float4 digit-window anchor comes from the column max
  (math.frexp — exact), not a per-chunk device reduction.
* **In-kernel predicate evaluation** for kernel-safe predicates
  (comparisons over 32-bit lanes with PostgreSQL NaN semantics, AND/OR/NOT
  with Kleene 3VL, NULL tests) — the WHERE clause runs on the VMEM tile.
* **int64 lanes ride as u32 (lo, hi) pairs** (Mosaic has no 64-bit vector
  ops): the executor splits the resident i64 plane once per chunk on
  device (cached in the tcache aux space) and passes the halves as extra
  inputs; subtraction of the 64-bit min happens in-kernel with explicit
  borrow arithmetic.

Eligibility is deliberately narrow (single dense 32-bit-lane group key;
plain-column agg args; kinds nrows/count/sum_i/sumsq_i/sum_f(float4);
kernel-safe or absent predicate) — everything else falls back to the v1
fused kernel or the XLA MXU path unchanged.  The output contract matches
the mxu layout (mxu_sums/mxu_fsums/mxu_f4exps + dense_* fields) so
mxu_absorb / mxu_extract_slot consume it with v2-shaped recipes.

Reference parity: gpupreagg preparation+reduction in one pass
(opencl_gpupreagg.h:380-615) with the qual evaluated in the same kernel
(gpupreagg_qual_eval, gpupreagg.c:1181-1943).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sqltypes import T
from ..expr.ir import Expr, ColumnRef, Const, FuncExpr, BoolExpr, NullTest
from .preagg_mxu import _SlotRecipe, F4_LIMBS

LANES = 128
F4_WINDOW_BITS = 72   # == preagg_mxu.F4_WINDOW (host divides by 2^72)
FLUSH_ROWS = 1 << 16
# 64k-row tiles measured 10.37 ms vs 10.74 (32k) / 11.39 (16k) on the
# round-4 flagship (tools/probe_r4_kernel.py): with SK=1 after the stats
# elisions, per-step fixed costs are no longer amortized at 32k.  VMEM at
# 64k: ~2 MB inputs + ~6 MB V/one-hot intermediates + 0.5 MB accs — fits.
# NOTE: bf16-digit acc exactness requires FLUSH_ROWS >= TILE rows per
# flush window (255 * 2^16 < 2^24 holds exactly at 64k).
MAX_TILE = 65536
P = 8

# storage lanes the kernel can read directly as (8, T4) blocks
_I32_LANE_TYPES = (T.INT4, T.DATE, T.TEXT, T.BPCHAR)
_KEY_TYPES = (T.INT4, T.DATE, T.TEXT, T.BPCHAR, T.BOOL)


# ---------------------------------------------------------------------------
# plan derivation (executor side; consumes column statistics)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class V2Sig:
    """Static kernel signature — hashable, part of the jit plan key.
    Carries structure only (op shapes / limb counts), never data values
    (mins/scales ride as runtime scalars so programs survive data
    versions)."""
    ops: tuple                   # kernel ops, see _build_kernel
    inputs: tuple                # (schema_idx, plane) plane in data/valid/lo/hi
    ni: int                      # i32 scalar count (after nrows at [0])
    nu: int                      # u32 scalar count
    nf4: int
    ncols: int                   # physical kernel columns
    S: int                       # recipe (mxu_sums) width
    int_map: tuple               # (recipe_col, phys_col, mult)
    shadow_map: tuple            # (recipe_shadow_col, phys_col)
    rng: int                     # dense key range; G buckets >= rng + 2
    has_pred: bool
    # input positions delivered as 2-D bool blocks (pallas converts i1
    # memrefs to i32 — cheaper than in-kernel i8 widen+reshape chains)
    bool_inputs: tuple = ()
    # int8 MXU mode: V digits + one-hot in i8, i32 accumulator.  Integer
    # limbs ride as digit-128 (the epilogue adds 128*bucket_rows back per
    # biased phys col — biased_cols); float4 digits are 7-bit signed.
    # Engages only when no shadow column exists (the fabs mirror needs the
    # f32 accumulator).
    i8: bool = False
    biased_cols: tuple = ()


@dataclasses.dataclass
class V2Plan:
    sig: V2Sig
    G: int
    kmin: int
    recipes: list                # per-agg {kind: _SlotRecipe}
    scal_i: np.ndarray           # (1, ni) int32  [0]=placeholder for nrows
    scal_u: np.ndarray           # (1, max(nu,1)) uint32
    f4sc: np.ndarray             # (2, max(nf4,1)) float32 two-step scales
    f4e: np.ndarray              # (max(nf4,1),) int32 window exponents
    split_cols: tuple            # schema idxs needing i64 (lo[,hi]) planes
    pred: Optional[Expr]


def _bits(x: int) -> int:
    return max(int(x).bit_length(), 1)


def _wrap_i32(v: int) -> int:
    """Two's-complement wrap of a python int into the int32 value range
    (the kernel subtracts in i32 where wraparound is the point)."""
    return ((int(v) & 0xFFFFFFFF) ^ 0x80000000) - 0x80000000


def _pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


_CMP_TAGS = {"=": "eq", "<>": "ne", "<": "lt", "<=": "le",
             ">": "gt", ">=": "ge"}
_PRED_OK_TYPES = (T.INT4, T.DATE, T.FLOAT4, T.BOOL)


def _pred_kernel_safe(e: Optional[Expr], schema) -> bool:
    """True when the predicate lowers to Mosaic-legal elementwise ops on
    32-bit lanes: comparisons (col vs const / col vs col, matching lane
    families), AND/OR/NOT, IS [NOT] NULL, bare bool columns/consts."""
    if e is None:
        return True

    def leaf_ok(a: Expr) -> bool:
        if isinstance(a, ColumnRef):
            return a.type in _PRED_OK_TYPES
        if isinstance(a, Const):
            return a.type in (T.INT4, T.INT2, T.INT8, T.DATE, T.FLOAT4,
                              T.FLOAT8, T.BOOL) and a.value is not None
        return False

    def ok(x: Expr) -> bool:
        if isinstance(x, BoolExpr):
            return all(ok(a) for a in x.args)
        if isinstance(x, NullTest):
            return isinstance(x.arg, ColumnRef)
        if isinstance(x, ColumnRef):
            return x.type is T.BOOL
        if isinstance(x, Const):
            return x.type is T.BOOL
        if isinstance(x, FuncExpr):
            op = x.fname.split("::", 1)[0]
            if op not in _CMP_TAGS or len(x.args) != 2:
                return False
            a, b = x.args
            if not (leaf_ok(a) and leaf_ok(b)):
                return False
            ts = {s.type for s in (a, b) if isinstance(s, ColumnRef)}
            if not ts:
                return False               # const-vs-const: let v1 fold it
            # int consts against float columns (and vice versa) are fine —
            # the const is materialized in the column's compare domain at
            # trace time; int8 consts must fit the i32/f32 compare exactly
            for s in (a, b):
                if isinstance(s, Const) and s.type in (T.INT8, T.INT2,
                                                       T.INT4, T.DATE):
                    v = int(s.value)
                    if T.FLOAT4 in ts:
                        if float(np.float32(v)) != v:
                            return False
                    elif not (-(1 << 31) <= v < (1 << 31)):
                        return False
                if isinstance(s, Const) and s.type in (T.FLOAT4, T.FLOAT8):
                    if T.FLOAT4 in ts and s.type is T.FLOAT8:
                        # f8 const vs f4 column: PG compares in f8; only a
                        # const exactly representable in f32 keeps the f32
                        # compare faithful
                        if not (math.isnan(float(s.value))
                                or float(np.float32(s.value))
                                == float(s.value)):
                            return False
                    if ts - {T.FLOAT4} and T.FLOAT4 not in ts:
                        return False       # float const vs int column
            return True
        return False

    return ok(e)


def _f4_stats(ast):
    """(mx, shadow_needed) for a float4 sum column; None => v2-ineligible
    (+-Inf makes the max-anchored window meaningless and a chunk WITHOUT
    the Inf row could emit garbage digits under a finite shadow)."""
    if (ast.min_val is not None
            and not (math.isfinite(ast.min_val)
                     and math.isfinite(ast.max_val))):
        return None
    mx = float(ast.max_val) if ast.min_val is not None else 0.0
    mx = max(mx, abs(float(ast.min_val or 0.0)))
    # the |v| shadow guards two hazards: non-finite inputs (NaN rows
    # contribute no digits and must force host replay) and PostgreSQL's
    # stepwise-f32 overflow error.  Statistics prove both away for most
    # columns: all-finite data with nrows*max|v| far below f32-max can
    # neither produce garbage digits nor overflow mid-sum.
    need_shadow = (ast.has_nan
                   or (ast.n_valid > 0 and ast.min_val is None)
                   or ast.nrows * mx >= 1e38)
    return mx, need_shadow


def v2_supported_kinds(inst, a_t) -> bool:
    for kind in inst.slots:
        if kind in ("nrows", "count"):
            continue
        if kind == "sum_i" and a_t in (T.INT4, T.INT8):
            continue
        if kind == "sumsq_i" and a_t is T.INT4:
            continue
        if kind == "sum_f" and a_t is T.FLOAT4:
            continue
        return False
    return True


def derive_v2_plan(columns: Sequence, schema, group_exprs, aggs,
                   pred: Optional[Expr], max_g: int) -> Optional[V2Plan]:
    """Build the v2 plan from real column statistics, or None when the
    query shape is outside v2's envelope (caller then uses the v1 path).

    columns: datastore.Column per schema position (stats source)."""
    from ..datastore import column_stats

    if len(group_exprs) != 1 or not isinstance(group_exprs[0], ColumnRef):
        return None
    key = group_exprs[0]
    if key.type not in _KEY_TYPES or key.type is T.BOOL:
        return None
    kcol = columns[key.index]
    if kcol.data.dtype != np.int32:
        return None
    kst = column_stats(kcol)
    if kst.n_valid == 0:
        kmin, rng = 0, 0
    else:
        kmin, rng = int(kst.min_val), int(kst.max_val) - int(kst.min_val)
    if rng + 2 > max_g:
        return None                        # sparse key: v1 ladder handles it
    if not _pred_kernel_safe(pred, schema):
        return None

    # int8 MXU mode pre-decision: possible iff NO column will need a |v|
    # shadow (the fabs mirror rides the f32 accumulator).  Shadows only
    # arise from float4 sums, so scan those args up front — the f4 digit
    # WIDTH (7-bit in i8 mode) depends on this choice.
    from ..config import config as _cfg
    want_i8 = bool(_cfg.use_preagg_int8)
    if want_i8:
        for inst in aggs:
            a = inst.args[0] if inst.args else None
            if (a is not None and isinstance(a, ColumnRef)
                    and "sum_f" in inst.slots and a.type is T.FLOAT4):
                fs = _f4_stats(column_stats(columns[a.index]))
                if fs is None or fs[1]:
                    want_i8 = False
                    break

    ops: list = []
    biased: list = []                      # phys cols carrying digit-128
    inputs: list = []
    in_ix: dict = {}
    # i32 scalar vector layout AT THE KERNEL: [nrows, kmin, user...].
    # scal_i here holds [kmin, user...]; the wrapper prepends nrows.
    scal_i: list = [_wrap_i32(kmin)]
    scal_u: list = []
    f4sc: list = []
    f4e: list = []
    split_cols: list = []
    int_map: list = []
    shadow_map: list = []
    col = 0
    recipes: list = []
    S = 1                                  # recipe col 0 = bucket row count
    # contributing-row count columns shared ACROSS agg instances: count(x)
    # and sum(x)'s okcnt read the same physical and recipe column
    cnt_phys_by_col: dict = {}
    cnt_rcol_by_col: dict = {}

    def get_in(idx: int, plane: str) -> int:
        k = (idx, plane)
        if k not in in_ix:
            in_ix[k] = len(inputs)
            inputs.append(k)
        return in_ix[k]

    def get_valid(idx: int) -> int:
        # statistics-driven elision: a column with zero NULLs never ships
        # its validity plane — the kernel treats -1 as constant-true
        if column_stats(columns[idx]).null_count == 0:
            return -1
        return get_in(idx, "valid")

    def emit(op, width) -> int:
        nonlocal col
        ops.append(op)
        c = col
        col += width
        return c

    # register key + predicate column planes as kernel inputs (the ops walk
    # below only registers agg-arg planes)
    get_in(key.index, "data")
    key_vin = get_valid(key.index)
    for node in ([pred] if pred is not None else []):
        stack = [node]
        while stack:
            x = stack.pop()
            if isinstance(x, ColumnRef):
                get_in(x.index, "data")
                get_valid(x.index)
            for ch in getattr(x, "children", lambda: ())():
                stack.append(ch)

    # physical col 0: the mask column (recipe col 0 and every nrows slot)
    int_map.append((0, emit(("mask",), 1), 1))

    for inst in aggs:
        a = inst.args[0] if inst.args else None
        if a is not None and not isinstance(a, ColumnRef):
            return None
        a_t = a.type if a is not None else None
        if not v2_supported_kinds(inst, a_t):
            return None
        acol = columns[a.index] if a is not None else None
        ast = column_stats(acol) if acol is not None else None
        d: dict = {}
        # statistics-driven dead-column elision: a NULL-free arg column's
        # contributing-row count IS the bucket row count (recipe col 0) —
        # no cnt column is built and no recipe slot allocated
        a_nullfree = ast is not None and ast.null_count == 0

        def cnt_phys() -> int:
            if a.index not in cnt_phys_by_col:
                vin = get_valid(a.index)
                cnt_phys_by_col[a.index] = emit(("cnt", vin), 1)
            return cnt_phys_by_col[a.index]

        def cnt_rcol() -> int:
            """Recipe column summing contributing rows of a.index (shared
            across instances; 0 when statistics elide it entirely)."""
            nonlocal S
            if a_nullfree:
                return 0
            if a.index not in cnt_rcol_by_col:
                int_map.append((S, cnt_phys(), 1))
                cnt_rcol_by_col[a.index] = S
                S += 1
            return cnt_rcol_by_col[a.index]

        for kind in inst.slots:
            if kind == "nrows":
                d[kind] = _SlotRecipe(kind, [0])   # maps onto recipe col 0
            elif kind == "count":
                d[kind] = _SlotRecipe(kind, [cnt_rcol()])
            elif kind == "sum_i":
                if ast.n_valid == 0:
                    amin, arng = 0, 0
                else:
                    amin = int(ast.min_val)
                    arng = int(ast.max_val) - amin
                nl = max(-(-_bits(arng) // 8), 1) if arng else 1
                if a_t is T.INT4:
                    din = get_in(a.index, "data")
                    si = len(scal_i)
                    scal_i.append(_wrap_i32(amin))
                    c = emit(("sum_i4", din, get_valid(a.index),
                              nl, si), nl)
                else:                      # INT8 via u32 pair planes
                    lin = get_in(a.index, "lo")
                    hin = get_in(a.index, "hi") if nl > 4 else -1
                    if a.index not in split_cols:
                        split_cols.append(a.index)
                    su = len(scal_u)
                    um = amin & ((1 << 64) - 1)
                    scal_u += [np.uint32(um & 0xFFFFFFFF),
                               np.uint32(um >> 32)]
                    c = emit(("sum_i8", lin, hin,
                              get_valid(a.index), nl, su), nl)
                if want_i8:
                    biased.extend(range(c, c + nl))
                r = _SlotRecipe(kind, list(range(S, S + nl)),
                                okcnt=-2, bias_value=amin)
                S += nl
                for j in range(nl):
                    int_map.append((r.limbs[j], c + j, 1))
                r.okcnt = cnt_rcol()       # shared contributing-row count
                d[kind] = r
            elif kind == "sumsq_i":
                maxabs = max(abs(int(ast.min_val or 0)),
                             abs(int(ast.max_val or 0)))
                din = get_in(a.index, "data")
                if maxabs < (1 << 16):
                    nl = max(-(-(2 * _bits(maxabs)) // 8), 1)
                    c = emit(("sumsq4", din, get_valid(a.index), nl),
                             nl)
                    if want_i8:
                        biased.extend(range(c, c + nl))
                    r = _SlotRecipe(kind, list(range(S, S + nl)))
                    S += nl
                    for j in range(nl):
                        int_map.append((r.limbs[j], c + j, 1))
                else:
                    # |v| = a*2^16 + b: v^2 = a^2*2^32 + ab*2^17 + b^2
                    c = emit(("sumsq4_big", din,
                              get_valid(a.index)), 12)
                    if want_i8:
                        biased.extend(range(c, c + 12))
                    r = _SlotRecipe(kind, list(range(S, S + 8)))
                    S += 8
                    for j in range(4):
                        int_map.append((r.limbs[j], c + j, 1))
                    for j in range(4):
                        int_map.append((r.limbs[j + 2], c + 4 + j, 2))
                    for j in range(4):
                        int_map.append((r.limbs[j + 4], c + 8 + j, 1))
                d[kind] = r
            else:                          # sum_f on FLOAT4
                din = get_in(a.index, "data")
                vin = get_valid(a.index)
                nf = len(f4sc)
                fs = _f4_stats(ast)
                if fs is None:
                    return None            # +-Inf column: v1 owns it
                mx, need_shadow = fs
                if mx > 0.0 and math.isfinite(mx):
                    _, E = math.frexp(mx)  # mx * 2^-E in [0.5, 1)
                else:
                    E = 0
                # stats-driven digit-window shrink: every |v| >= 2^(Emin-1)
                # (Emin = frexp exponent of the column's smallest nonzero
                # |v|) has no mantissa bit below 2^(Emin-1-23); a window
                # whose floor E-dbits*nl reaches it captures EVERY row's
                # full f32 mantissa, so fewer limb columns lose nothing.
                # i8 mode: 7-bit signed digits (fit int8 with the sign
                # folded in); cap 11 limbs keeps >= the 72-bit window.
                dbits = 7 if want_i8 else 8
                cap = 11 if want_i8 else F4_LIMBS
                nl = cap
                if mx == 0.0:
                    nl = 1                 # only zeros (or nothing) to sum
                elif ast.minabs is not None:
                    _, emn = math.frexp(ast.minabs)
                    nl = max(1, min(cap, -(-(E - emn + 24) // dbits)))
                e1 = E - E // 2
                f4sc.append((np.float32(2.0 ** (-e1)),
                             np.float32(2.0 ** (-(E - e1)))))
                # host extract divides by 2^F4_WINDOW always; an nl-limb
                # digit sum m represents m * 2^(E - dbits*nl), so publish
                # the window-adjusted exponent
                f4e.append(np.int32(E + (F4_WINDOW_BITS - dbits * nl)))
                # a NaN-free column (== no shadow) also lets the kernel
                # take |v| with one abs op instead of the NaN-zeroing
                # pos/neg split (op flag)
                c = emit(("f4s", din, vin, nf, nl,
                          bool(not need_shadow)), nl)
                r = _SlotRecipe(kind, list(range(S, S + nl)),
                                f4_slot_no=nf, limb_bits=dbits)
                S += nl
                for j in range(nl):
                    int_map.append((r.limbs[j], c + j, 1))
                if need_shadow:
                    r.shadow = S
                    S += 1
                    shadow_map.append((r.shadow, emit(("fabs", din, vin),
                                                      1)))
                d[kind] = r
        recipes.append(d)

    if col > LANES:
        return None
    shadow_map.sort(key=lambda p: p[0])
    bool_in = tuple(
        i for i, (idx, which) in enumerate(inputs)
        if which == "valid" or (which == "data"
                                and columns[idx].data.dtype == np.bool_))
    assert not (want_i8 and shadow_map)
    sig = V2Sig(ops=tuple(ops), inputs=tuple(inputs),
                ni=len(scal_i) + 1,       # +1: nrows prepended per call
                nu=max(len(scal_u), 1), nf4=len(f4sc), ncols=col, S=S,
                int_map=tuple(int_map), shadow_map=tuple(shadow_map),
                rng=rng, has_pred=pred is not None, bool_inputs=bool_in,
                i8=want_i8, biased_cols=tuple(biased))
    G = max(_pow2(rng + 2), 8)
    return V2Plan(
        sig=sig, G=G, kmin=kmin, recipes=recipes,
        scal_i=np.asarray([scal_i], np.int32),
        scal_u=np.asarray([scal_u or [0]], np.uint32),
        f4sc=np.asarray(list(zip(*f4sc)) if f4sc else [[0.0], [0.0]],
                        np.float32),
        f4e=np.asarray(f4e or [0], np.int32),
        split_cols=tuple(split_cols), pred=pred)


# ---------------------------------------------------------------------------
# in-kernel predicate mini-lowerer (PG 3-valued logic + float NaN order)
# ---------------------------------------------------------------------------

def _kpred(e: Expr, rd_col, key_schema) -> tuple:
    """Lower a kernel-safe predicate over (8, T4) blocks -> (data, valid)
    bool arrays.  Mirrors expr/lower_jax._cmp semantics for the supported
    subset (comparisons with PG NaN ordering, Kleene AND/OR/NOT, NULL
    tests)."""
    if isinstance(e, BoolExpr):
        subs = [_kpred(a, rd_col, key_schema) for a in e.args]
        if e.op == "not":
            d, v = subs[0]
            return ~d, v
        d, v = subs[0]
        for d2, v2 in subs[1:]:
            if e.op == "and":
                nv = (v & v2) | (v & ~d) | (v2 & ~d2)
                d = d & d2
            else:
                nv = (v & v2) | (v & d) | (v2 & d2)
                d = d | d2
            v = nv
        return d, v
    if isinstance(e, NullTest):
        cd, cv = rd_col(e.arg)
        if cv is None:                 # validity elided: never NULL
            cv = jnp.full(cd.shape, True)
        r = ~cv if e.isnull else cv
        return r, jnp.ones_like(r)
    if isinstance(e, ColumnRef):               # bare bool column
        cd, cv = rd_col(e)
        if cv is None:
            cv = jnp.full(cd.shape, True)
        return cd.astype(jnp.bool_), cv
    assert isinstance(e, FuncExpr)
    tag = _CMP_TAGS[e.fname.split("::", 1)[0]]
    a, b = e.args
    is_float = any(isinstance(s, ColumnRef) and s.type is T.FLOAT4
                   for s in (a, b))

    def side(s):
        if isinstance(s, ColumnRef):
            d, v = rd_col(s)
            if is_float and s.type is not T.FLOAT4:
                d = d.astype(jnp.float32)
            elif not is_float:
                d = d.astype(jnp.int32)
            return d, v
        val = s.value
        if is_float:
            return jnp.float32(float(val)), None
        return jnp.int32(int(val)), None

    (xd, xv), (yd, yv) = side(a), side(b)
    valid = None
    for v in (xv, yv):
        if v is not None:
            valid = v if valid is None else (valid & v)
    if is_float:
        # PG float order: NaN == NaN, NaN > everything.  Pure boolean
        # algebra, NOT jnp.where on i1 operands — Mosaic lowers a boolean
        # select as an i8 select + an i8->i1 trunci it cannot legalize
        # (isolated via the server loc trace; the round-3 kernel's one
        # compile blocker)
        xn, yn = jnp.isnan(xd), jnp.isnan(yd)
        n = xn | yn
        lt = (n & (~xn) & yn) | (~n & (xd < yd))
        eq = (n & xn & yn) | (~n & (xd == yd))
        d = {"eq": eq, "ne": ~eq, "lt": lt, "le": lt | eq,
             "gt": ~(lt | eq), "ge": ~lt}[tag]
    else:
        d = {"eq": xd == yd, "ne": xd != yd, "lt": xd < yd,
             "le": xd <= yd, "gt": xd > yd, "ge": xd >= yd}[tag]
    if d.ndim == 0:                        # const vs const guard (unused)
        d = jnp.broadcast_to(d, valid.shape)
    return d, (valid if valid is not None else jnp.ones_like(d))


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

# one-hot construction strategy (probe-tunable; tools/probe_r4_attrib
# measured the alternatives on v5e): "rep" (default) materializes the
# (G*P, T4) repeated-seg block and compares against a bucket iota;
# "blocks" compares the (P, T4) seg block against each bucket scalar and
# concatenates G results — measured 25% SLOWER at G=32 (12.3 vs 9.8 ms
# count-only flagship): Mosaic pipelines the big rep+compare better than
# 32 small concats, so the rep path stays.
ONEHOT_MODE = "rep"
# bool -> V-dtype cast strategy for mask/cnt/one-hot rows (probe-tunable):
# "via_i32" (default) casts i1 -> i32 -> i8; "direct" casts i1 -> i8 in
# one step; "select" lowers as a where() over i8 constants.  Measured on
# HW (tools/probe_cast_ab.py, interleaved windows): via_i32 == direct to
# within 0.01 ms (Mosaic fuses both); "select" CRASHES the remote compile
# helper (the round-3 bool-select trunci hazard again).  The known-legal
# chain stays.
CAST_MODE = "via_i32"


@functools.lru_cache(maxsize=128)
def _build_kernel(sig: V2Sig, key_in_d: int, key_in_v: int,
                  pred_key: Any, N: int, G: int, TILE: int,
                  interpret: bool, onehot_mode: str = "rep",
                  cast_mode: str = "via_i32"):
    """sig.ops drive the V-matrix build; pred_key is the predicate expr
    (hashable IR) lowered in-kernel, or None."""
    T4 = TILE // P
    GP = G * P
    K = sig.ncols
    nsteps = N // TILE
    I8 = sig.i8
    VDT = jnp.int8 if I8 else jnp.bfloat16
    ADT = jnp.int32 if I8 else jnp.float32
    # i32 accumulator: |digit| <= 128 so 2^24 rows fit exactly (the -2^31
    # corner is representable); bf16/f32 needs the 2^16-row window
    flush_every = max(((1 << 24) if I8 else FLUSH_ROWS) // TILE, 1)
    # exactness invariants: a flush window's worst-case cell must fit the
    # accumulator exactly (f32 integers to 2^24; i32 to 2^31)
    assert flush_every * TILE * 255 < (1 << 24) or I8, (TILE, flush_every)
    assert flush_every * TILE * 128 <= (1 << 31) or not I8, \
        (TILE, flush_every)
    SK = -(-K * P // LANES)
    SKL = SK * LANES
    n_in = len(sig.inputs)

    def rep(x, k):
        return x if k == 1 else jnp.concatenate([x] * k, axis=0)

    def limb_iota(k, mod=None):
        it = (jax.lax.broadcasted_iota(jnp.int32, (k * P, T4), 0)
              // jnp.int32(P))
        return it if mod is None else it % jnp.int32(mod)

    def u_limbs(u, nl):
        """nl 8-bit limb rows of a u32 block, limbs [0, nl).
        i8 mode: digits ride as digit-128 (fits int8); the epilogue adds
        128*bucket_rows back per biased phys col."""
        r = rep(u, nl)
        sh = limb_iota(nl) * jnp.int32(8)
        d = (((r >> sh.astype(jnp.uint32)) & jnp.uint32(0xFF))
             .astype(jnp.int32))
        if I8:
            return (d - jnp.int32(128)).astype(jnp.int8)
        return d.astype(jnp.bfloat16)

    def bool_to_v(b):
        if I8:
            if cast_mode == "direct":
                return b.astype(jnp.int8)
            if cast_mode == "select":
                return jnp.where(b, jnp.int8(1), jnp.int8(0))
            return b.astype(jnp.int32).astype(jnp.int8)
        return b.astype(jnp.bfloat16)

    def kernel(*refs):
        in_refs = refs[:n_in]
        si_ref, su_ref, sc_ref = refs[n_in:n_in + 3]
        hi_ref, lo_ref, sh_ref = refs[n_in + 3:n_in + 6]
        acc, hi_acc, lo_acc, sh_acc = refs[n_in + 6:]
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc[:] = jnp.zeros_like(acc)
            hi_acc[:] = jnp.zeros_like(hi_acc)
            lo_acc[:] = jnp.zeros_like(lo_acc)
            sh_acc[:] = jnp.zeros_like(sh_acc)

        def rd(i):
            # non-bool lanes arrive as FLAT (TILE,) blocks and reshape to
            # (P, T4) in VMEM — measured free on v5e, where the XLA-side
            # 1-D -> (N/T4, T4) retile of every input plane cost ~2.5ms
            # per 2^26-row chunk.  Bool lanes arrive 2-D (pallas converts
            # i1 memrefs to i32; in-kernel i8 widen+reshape chains measured
            # ~1.5ms/lane slower).  i == -1: statistics proved the column
            # NULL-free and the validity plane was elided — constant true.
            if i < 0:
                return None
            v = in_refs[i][:]
            return v if i in bool_set else v.reshape(P, T4)

        def rd_ok(i, base):
            """validity lane & base mask (elided lane -> base)."""
            v = rd(i)
            return base if v is None else (v & base)

        bool_set = frozenset(sig.bool_inputs)
        nrows = si_ref[0, 0]
        kmin = si_ref[0, 1]
        rng = jnp.int32(sig.rng)
        # live-row mask: fold the step offset into the SCALAR threshold
        # (SMEM arithmetic, ~free) so the vector side is one iota-linear
        # compare instead of per-step index reconstruction
        thr = nrows - step * jnp.int32(TILE)
        live = ((jax.lax.broadcasted_iota(jnp.int32, (P, T4), 0)
                 * jnp.int32(T4)
                 + jax.lax.broadcasted_iota(jnp.int32, (P, T4), 1)) < thr)

        def rd_col(cref: ColumnRef):
            di = _in_index(sig, cref.index, "data")
            try:
                vi = _in_index(sig, cref.index, "valid")
            except ValueError:
                vi = -1                # validity elided (NULL-free column)
            return rd(di), rd(vi)

        if pred_key is not None:
            pd, pv = _kpred(pred_key, rd_col, None)
            mask = live & pd & pv
        else:
            mask = live
        kd = rd(key_in_d)
        okk = rd_ok(key_in_v, mask)
        # kmin/rng derive from EXACT column statistics (datastore
        # column_stats over the immutable column version), so a valid key
        # outside [kmin, kmin+rng] cannot exist — the v1 runtime-window
        # guard (bad-key clip + fail lane) is provably dead here and its
        # five per-step VPU ops are elided.  dense_fail stays in the
        # output contract as constant false.
        segk = kd - kmin
        if key_in_v < 0:
            # key proven NULL-free: okk == mask, the null-key bucket is
            # unreachable — one select
            seg = jnp.where(mask, segk, jnp.int32(G))
        else:
            seg = jnp.where(mask,
                            jnp.where(okk, segk, rng + jnp.int32(1)),
                            jnp.int32(G))

        rows: list = []
        for op in sig.ops:
            tag = op[0]
            if tag == "mask":
                rows.append(bool_to_v(mask))
            elif tag == "cnt":
                rows.append(bool_to_v(rd_ok(op[1], mask)))
            elif tag == "sum_i4":
                _, din, vin, nl, si = op
                ok = rd_ok(vin, mask)
                # scal layout [nrows, kmin=scal_i[0], ...]: user index si
                # lands at kernel offset si + 1
                u = jax.lax.bitcast_convert_type(rd(din) - si_ref[0, si + 1],
                                                 jnp.uint32)
                u = jnp.where(ok, u, jnp.uint32(0))
                rows.append(u_limbs(u, nl))
            elif tag == "sum_i8":
                _, lin, hin, vin, nl, su = op
                ok = rd_ok(vin, mask)
                mlo = su_ref[0, su]
                lo = rd(lin) - mlo
                if nl <= 4:
                    lo = jnp.where(ok, lo, jnp.uint32(0))
                    rows.append(u_limbs(lo, nl))
                else:
                    borrow = (rd(lin) < mlo).astype(jnp.uint32)
                    hi = rd(hin) - su_ref[0, su + 1] - borrow
                    lo = jnp.where(ok, lo, jnp.uint32(0))
                    hi = jnp.where(ok, hi, jnp.uint32(0))
                    rows.append(jnp.concatenate(
                        [u_limbs(lo, 4), u_limbs(hi, nl - 4)], axis=0))
            elif tag in ("sumsq4", "sumsq4_big"):
                din, vin = op[1], op[2]
                ok = rd_ok(vin, mask)
                d = rd(din)
                ub = jax.lax.bitcast_convert_type(d, jnp.uint32)
                u = jnp.where(d < jnp.int32(0), jnp.uint32(0) - ub, ub)
                u = jnp.where(ok, u, jnp.uint32(0))
                if tag == "sumsq4":
                    rows.append(u_limbs(u * u, op[3]))
                else:
                    a = u >> jnp.uint32(16)
                    b = u & jnp.uint32(0xFFFF)
                    for sq in (b * b, a * b, a * a):
                        rows.append(u_limbs(sq, 4))
            elif tag == "f4s":
                din, vin, nf, nl = op[1], op[2], op[3], op[4]
                use_abs = op[5] if len(op) > 5 else False
                ok = rd_ok(vin, mask)
                x = jnp.where(ok, rd(din), jnp.float32(0.0))
                zero = jnp.float32(0.0)
                sgn = jnp.where(x < zero, jnp.float32(-1.0),
                                jnp.float32(1.0))
                if use_abs:
                    # stats proved the column NaN-free: plain |x| (the
                    # pos/neg split below exists only to zero NaN digits)
                    av = jnp.abs(x)
                else:
                    pos = jnp.where(x > zero, x, zero)
                    neg = jnp.where(x < zero, -x, zero)
                    av = pos + neg
                v = (av * sc_ref[0, nf]) * sc_ref[1, nf]
                # nl stats-shrunk limbs = the TOP nl digits of the
                # window: extract ceil(nl/3) base-2^(3*DB) ints (DB=8-bit
                # digits bf16 mode / 7-bit i8 mode), drop the lowest
                # 3*iters-nl digits of the least-significant int
                DB = 7 if I8 else 8
                iters = -(-nl // 3)
                drop = 3 * iters - nl
                pb = jnp.float32(1 << (3 * DB))
                ints = []
                for _ in range(iters):
                    w = v * pb
                    i_ = jnp.floor(w)
                    v = w - i_
                    ints.append(i_.astype(jnp.int32))
                parts = [rep(t, 3) for t in reversed(ints[:-1] if drop
                                                     else ints)]
                if drop:
                    parts.insert(0, rep(ints[-1], 3 - drop))
                rowsN = (jnp.concatenate(parts, axis=0)
                         if len(parts) > 1 else parts[0])
                shl = (((limb_iota(nl) + jnp.int32(drop)) % jnp.int32(3))
                       * jnp.int32(DB))
                digits = (rowsN >> shl) & jnp.int32((1 << DB) - 1)
                if I8:
                    # 7-bit digits with the sign folded in fit int8
                    # (i32 multiply — bool-block rep is not Mosaic-safe)
                    sgn_i = jnp.where(x < zero, jnp.int32(-1), jnp.int32(1))
                    rows.append((digits * rep(sgn_i, nl)).astype(jnp.int8))
                else:
                    rows.append((digits.astype(jnp.float32) * rep(sgn, nl))
                                .astype(jnp.bfloat16))
            elif tag == "fabs":
                din, vin = op[1], op[2]
                ok = rd_ok(vin, mask)
                x = jnp.where(ok, rd(din), jnp.float32(0.0))
                rows.append(jnp.abs(x).astype(jnp.bfloat16))
            else:                          # pragma: no cover
                raise AssertionError(tag)
        if K * P < SKL:
            rows.append(jnp.zeros((SKL - K * P, T4), VDT))
        Vt = jnp.concatenate(rows, axis=0)

        # one-hot via i32 compare + cast (bf16/i8 compares are not
        # supported by this target's Mosaic — "Target does not support
        # this comparison")
        if onehot_mode == "blocks":
            # per-bucket scalar compares on the (P, T4) seg block: no
            # (G*P, T4) i32 rep or iota ever materializes
            oht = jnp.concatenate(
                [bool_to_v(seg == jnp.int32(g)) for g in range(G)],
                axis=0)
        elif onehot_mode == "const":
            # FLOOR PROBE ONLY (wrong results): a seg-independent one-hot
            # isolates the seg-compare/rep construction cost
            oht = bool_to_v(limb_iota(G) == (step % jnp.int32(G)))
        else:
            oht = bool_to_v(rep(seg, G) == limb_iota(G))
        for sg in range(-(-GP // LANES)):
            g0 = sg * LANES
            h = min(LANES, GP - g0)
            oh_sg = oht[g0:g0 + h]
            for sk in range(SK):
                k0 = sk * LANES
                acc[g0:g0 + h, k0:k0 + LANES] += jax.lax.dot_general(
                    oh_sg, Vt[k0:k0 + LANES], (((1,), (1,)), ((), ())),
                    preferred_element_type=ADT)

        @pl.when((step % jnp.int32(flush_every)
                  == jnp.int32(flush_every - 1))
                 | (step == jnp.int32(nsteps - 1)))
        def _():
            a = acc[:]
            if sig.shadow_map:         # no shadow columns => skip the f32
                sh_acc[:] += a         # mirror accumulation entirely
            t = a.astype(jnp.int32)
            lo_acc[:] += t & jnp.int32(0xFFF)
            hi_acc[:] += t >> jnp.int32(12)
            acc[:] = jnp.zeros_like(acc)

        @pl.when(step == jnp.int32(nsteps - 1))
        def _():
            hi_ref[:] = hi_acc[:]
            lo_ref[:] = lo_acc[:]
            sh_ref[:] = sh_acc[:]

    lane1 = pl.BlockSpec((TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM)
    lane2 = pl.BlockSpec((P, T4), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM)
    lane_specs = [lane2 if i in sig.bool_inputs else lane1
                  for i in range(n_in)]
    out_spec = pl.BlockSpec((GP, SKL), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)

    def srow(h, w):
        return pl.BlockSpec((h, w), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel, grid=(nsteps,), interpret=interpret,
        in_specs=lane_specs + [srow(1, sig.ni), srow(1, sig.nu),
                               srow(2, max(sig.nf4, 1))],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((GP, SKL), jnp.int32),
                   jax.ShapeDtypeStruct((GP, SKL), jnp.int32),
                   jax.ShapeDtypeStruct((GP, SKL), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((GP, SKL), ADT),
                        pltpu.VMEM((GP, SKL), jnp.int32),
                        pltpu.VMEM((GP, SKL), jnp.int32),
                        pltpu.VMEM((GP, SKL), jnp.float32)],
    )


def _in_index(sig: V2Sig, schema_idx: int, plane: str) -> int:
    return sig.inputs.index((schema_idx, plane))


# ---------------------------------------------------------------------------
# jittable wrapper (XLA side: input gather + epilogue into the mxu layout)
# ---------------------------------------------------------------------------

def build_fused2_fn(schema, group_exprs, aggs, pred, G: int, sig: V2Sig):
    """f(cols, nrows, salt, scal) -> mxu-layout output pytree.

    scal: {"i": (1, ni) i32 (slot 0 overwritten by nrows, slot 1 kmin),
           "u": (1, nu) u32, "f4sc": (2, nf4) f32, "f4e": (nf4,) i32,
           "split": {schema_idx: (lo, hi) u32 arrays}}."""
    key = group_exprs[0]
    interpret = jax.default_backend() == "cpu"

    def f(cols, nrows, salt, scal):
        n = cols[0][0].shape[0]
        TILE = min(MAX_TILE, n)
        T4 = TILE // P

        def plane(idx, which):
            if which == "data":
                p = cols[idx][0]
            elif which == "valid":
                p = cols[idx][1]
            else:
                p = scal["split"][idx][0 if which == "lo" else 1]
            return p

        kin = tuple(
            plane(i, w).reshape(-1, T4) if pos in sig.bool_inputs
            else plane(i, w)
            for pos, (i, w) in enumerate(sig.inputs))
        # i32 scalar row: [nrows, kmin, user...] — scal["i"] = [kmin, user...]
        si = jnp.concatenate(
            [jnp.asarray(nrows, jnp.int32).reshape(1, 1),
             jnp.asarray(scal["i"], jnp.int32)], axis=1)
        try:
            kvi = _in_index(sig, key.index, "valid")
        except ValueError:
            kvi = -1                   # key column proven NULL-free
        kfn = _build_kernel(sig, _in_index(sig, key.index, "data"),
                            kvi, pred, n, G, TILE, interpret,
                            ONEHOT_MODE, CAST_MODE)
        hi, lo, sh = kfn(*kin, si,
                               jnp.asarray(scal["u"], jnp.uint32),
                               jnp.asarray(scal["f4sc"], jnp.float32))
        # strided-diagonal reduce in NARROW dtypes first (i64/f64 are
        # software-emulated on TPU): hi/lo stay int32 through the (G, P,
        # K, P) diagonal sum — per-cell hi <= sum_flushes(acc>>12) <
        # 2^26/4096 * 2^12 and the P-way sum adds 3 bits, well inside
        # int32 — then widen only the (G, K) result
        SKL = hi.shape[1]
        hd = jnp.diagonal(hi.reshape(G, P, SKL // P, P), axis1=1, axis2=3)
        ld = jnp.diagonal(lo.reshape(G, P, SKL // P, P), axis1=1, axis2=3)
        ints = (jnp.sum(hd, axis=-1).astype(jnp.int64) << 12) \
            + jnp.sum(ld, axis=-1).astype(jnp.int64)
        if sig.i8 and sig.biased_cols:
            # i8 limbs rode as digit-128: every bucket row contributed
            # -128 per biased phys col — add 128*bucket_rows (phys col 0,
            # the mask count) back, exactly, before the recipe mixdown
            bc = np.asarray(sig.biased_cols, np.int32)
            ints = ints.at[:, bc].add(ints[:, 0:1] * jnp.int64(128))
        sums = jnp.zeros((G, sig.S), jnp.int64)
        by_mult: dict = {}
        for rc, pc, m in sig.int_map:
            by_mult.setdefault(m, []).append((rc, pc))
        for m, pairs in by_mult.items():
            rcs = np.asarray([p[0] for p in pairs], np.int32)
            pcs = np.asarray([p[1] for p in pairs], np.int32)
            sums = sums.at[:, rcs].add(ints[:, pcs] * jnp.int64(m))
        if sig.shadow_map:
            s4 = sh.reshape(G, P, SKL // P, P)
            sh_g = jnp.sum(jnp.diagonal(s4, axis1=1, axis2=3),
                           axis=-1).astype(jnp.float64)
            pcs = np.asarray([pc for _, pc in sig.shadow_map], np.int32)
            fsums = sh_g[:, pcs].astype(jnp.float64)
        else:
            fsums = jnp.zeros((G, 0), jnp.float64)

        return {
            "err": jnp.uint8(0),
            "mxu_sums": sums,
            "mxu_fsums": fsums,
            "mxu_f4exps": jnp.asarray(scal["f4e"], jnp.int32),
            "slots": tuple({} for _ in aggs),
            "dense_kmin": jnp.asarray(scal["i"], jnp.int32)[0, 0]
            .astype(jnp.int64),
            "dense_rng": jnp.int32(sig.rng),
            # exact column statistics make out-of-range keys impossible
            # (the v1 runtime-window guard this kernel elides)
            "dense_fail": jnp.bool_(False),
        }

    return f
