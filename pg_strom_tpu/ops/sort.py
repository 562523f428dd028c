"""ORDER BY: multi-key device sort.

The reference kept GpuSort in deadcode (deadcode/gpusort.c: CustomPlan Sort
replacement with bitonic kernels) but it is part of the capability envelope
and the BASELINE configs include ORDER BY — here it is first-class.

TPU-native design — single-operand packed sorts.  Variadic `lax.sort`
(key + payload operands) triggers a pathological minutes-long compile on
TPU at chunk sizes (a 2-operand i32 sort of 4M rows measured 920 s to
compile vs 29 s for the same sort with key and row-id packed into one
int64 — tools/tpu_sort_probe.sh), so every sort here is ONE int64 operand:

  wide = (unsigned-comparable key bits << rbits) | row_id
  perm = lax.sort(wide) & (2^rbits - 1)

Row-id in the low bits makes the sort stable by construction.  Multi-key
ORDER BY packs all key lanes into the word when they fit (≤ 63-rbits bits);
wider key sets run LSD passes (least-significant key group first), composing
permutations between passes — the classic radix strategy, each pass again a
single-operand sort.

Per-key encoding to unsigned-comparable bit chunks:
  ints/date/time  biased two's complement within the type's width
  floats          exact IEEE total-order keys (NaN greatest — PG btree order)
  numeric         (magnitude class, normalized mantissa) lanes — exact
  DESC            chunk bits inverted within their width
  NULLS           one leading bit per key (first/last by ORDER BY spec)
  padding rows    one global leading dead bit → always sort last
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..sqltypes import T
from ..expr.ir import Expr
from ..expr.lower_jax import Lowerer, DVal, ColMeta, _f64_orderkey


@dataclasses.dataclass(frozen=True)
class SortSpec:
    expr: Expr
    descending: bool = False
    nulls_first: Optional[bool] = None   # None = PG default (last if ASC)

    def nulls_go_first(self) -> bool:
        return self.descending if self.nulls_first is None else self.nulls_first


def _rbits(n: int) -> int:
    b = 1
    while (1 << b) < max(n, 2):
        b += 1
    return b


def _order_lanes(v: DVal) -> list[tuple[jnp.ndarray, int]]:
    """(int64 lane, bit width) pairs; lexicographic ascending order of the
    biased chunks == SQL ascending order of the value."""
    if v.t is T.NUMERIC:
        from .preagg import _num_sort_keys
        p, s = _num_sort_keys(v.data, v.exp)
        return _bias_chunks(p, 10) + _bias_chunks(s, 62)
    if v.t is T.FLOAT8:
        bits = getattr(v, "bits", None)
        if bits is not None:
            key = _f64_orderkey(bits)
        else:
            key = _f64_orderkey(jax.lax.bitcast_convert_type(
                v.data.astype(jnp.float64), jnp.int64))
        return _bias_chunks(key, 64)
    if v.t is T.FLOAT4:
        b32 = jax.lax.bitcast_convert_type(v.data.astype(jnp.float32), jnp.int32)
        b32 = jnp.where(b32 == jnp.int32(-(1 << 31)), jnp.int32(0), b32)
        expm = jnp.int32(0x7F800000)
        isn = ((b32 & expm) == expm) & ((b32 & jnp.int32(0x007FFFFF)) != 0)
        b32 = jnp.where(isn, jnp.int32(0x7FC00000), b32)
        key = jnp.where(b32 < 0, jnp.int32(-1) - (b32 & jnp.int32(0x7FFFFFFF)), b32)
        return _bias_chunks(key.astype(jnp.int64), 32)
    width = {T.BOOL: 1, T.INT2: 16, T.INT4: 32, T.DATE: 32,
             T.TIME: 64, T.TIMESTAMP: 64, T.INT8: 64}.get(v.t, 64)
    return _bias_chunks(v.data.astype(jnp.int64), width)


def _bias_chunks(lane: jnp.ndarray, width: int) -> list[tuple[jnp.ndarray, int]]:
    """Signed int64 lane of `width` significant bits -> non-negative
    unsigned-comparable chunks of <= 33 bits each (so chunk+rowid packs)."""
    if width <= 1:
        return [(lane.astype(jnp.int64) & jnp.int64(1), 1)]
    u = lane.astype(jnp.uint64) ^ jnp.uint64(1 << (width - 1) if width < 64
                                             else 1 << 63)
    if width < 64:
        u = u & jnp.uint64((1 << width) - 1)
    if width <= 33:
        return [(u.astype(jnp.int64), width)]
    hi_w = width - 31
    hi = (u >> 31).astype(jnp.int64)
    lo = (u & jnp.uint64((1 << 31) - 1)).astype(jnp.int64)
    out = []
    if hi_w > 33:                      # width 64: hi is 33 bits after this
        out.extend(_chunks_from_unsigned(hi, hi_w))
    else:
        out.append((hi, hi_w))
    out.append((lo, 31))
    return out


def _chunks_from_unsigned(u: jnp.ndarray, width: int) -> list[tuple[jnp.ndarray, int]]:
    out = []
    while width > 33:
        out.append(((u >> (width - 31)) & jnp.int64((1 << 31) - 1), 31))
        width -= 31
    out.append((u & jnp.int64((1 << width) - 1), width))
    return out


def _key_lanes(v: DVal, sp: SortSpec) -> list[tuple[jnp.ndarray, int]]:
    """Null bit + encoded value chunks for one ORDER BY key."""
    isnull = (~v.valid).astype(jnp.int64)
    null_bit = isnull if not sp.nulls_go_first() else (1 - isnull)
    lanes = [(null_bit, 1)]
    for chunk, w in _order_lanes(v):
        c = jnp.where(v.valid, chunk, jnp.int64(0))
        if sp.descending:
            c = jnp.int64((1 << w) - 1) - c
        lanes.append((c, w))
    return lanes


def packed_argsort(lanes: Sequence[tuple[jnp.ndarray, int]], n: int) -> jnp.ndarray:
    """Stable ascending argsort over lexicographic (lane, width) chunks,
    most-significant first.  Every lax.sort call is single-operand; key sets
    wider than 63-rbits bits run LSD passes with permutation composition."""
    rb = _rbits(n)
    budget = 63 - rb
    # group lanes from the LEAST significant end; each group <= budget bits
    groups: list[list[tuple[jnp.ndarray, int]]] = []
    cur: list[tuple[jnp.ndarray, int]] = []
    used = 0
    for lane, w in reversed(list(lanes)):
        if w > budget:
            raise ValueError(f"lane width {w} exceeds pack budget {budget}")
        if used + w > budget:
            groups.append(cur)
            cur, used = [], 0
        cur.append((lane, w))          # within group: LSB-first
        used += w
    if cur:
        groups.append(cur)

    iota = jax.lax.broadcasted_iota(jnp.int64, (n,), 0)
    # pack every group's word BEFORE any permutation: an LSD pass then costs
    # ONE gather (wide[perm]) + one composition gather (perm[idx]) instead of
    # a gather per lane — TPU random gathers are ~150ms/16M rows, the
    # dominant cost of multi-pass sorts (BASELINE.md environment truths)
    packed: list[jnp.ndarray] = []
    for g in groups:                   # least-significant group first (LSD)
        wide = jnp.zeros((n,), dtype=jnp.int64)
        shift = rb
        for lane, w in g:              # g is LSB-first: shift upward
            wide = wide | (lane << shift)
            shift += w
        packed.append(wide)
    perm = None
    for wide in packed:
        w = wide if perm is None else wide[perm]
        s = jax.lax.sort(w | iota)     # low bits = current position: stable
        idx = (s & jnp.int64((1 << rb) - 1)).astype(jnp.int32)
        perm = idx if perm is None else perm[idx]
    return perm if perm is not None else iota.astype(jnp.int32)


def argsort_i32(vals: jnp.ndarray, n: int, vbits: int = 32) -> jnp.ndarray:
    """Stable argsort of a non-negative int lane (< 2^vbits) — the packed
    replacement for jnp.argsort(..., stable=True) used by hashjoin bucket
    ordering, preagg hash-sort grouping and the shuffle partitioner."""
    return packed_argsort([(vals.astype(jnp.int64), vbits)], n)


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


def build_sort_topk_fn(schema: Sequence[ColMeta], specs: Sequence[SortSpec],
                       pred: Optional[Expr], k: int,
                       exact: bool = False) -> Callable:
    """ORDER BY ... LIMIT k kernel: f(cols, nrows) ->
       (top int32[k], key_lanes tuple of int64[k], nqual, err, ovf).

    Returns the k first row indexes in sort order among rows passing `pred`
    (rows failing the qual carry a leading dead bit and sort last), plus the
    encoded key-lane values at those rows so the host can merge candidates
    across chunks with a lexicographic compare — the merge sees exactly the
    bits the device sorted on, so cross-chunk order == single-chunk order.

    Strategies (chosen at trace time; replaces the reference deadcode
    GpuSort's full bitonic sort for LIMIT queries):
      * packed top-k — when every key lane + the row id fit in one 63-bit
        word, a single `lax.top_k` over the negated packed keys IS the exact
        stable top-k (row id in the low bits = stability).  Measured 10-24x
        over the full packed argsort at 4M rows.
      * threshold top-k — wider keys: `lax.top_k` over a 63-bit key PREFIX
        finds the k-th smallest prefix t; every true top-k row has prefix
        <= t, so gather the candidate set {prefix <= t} (second top_k as the
        static-shape compaction) and finish with an exact packed argsort over
        the small candidate buffer.  If prefix ties overflow the buffer
        (`ovf` output), the caller re-runs the chunk with exact=True — the
        same host-driven regrow/retry contract as the join's
        DataStoreNoSpace analog (gpuhashjoin.c:4323-4425).
      * exact=True (or large k) — the original full packed argsort.
    """
    specs = list(specs)

    def f(cols: tuple, nrows):
        n = cols[0][0].shape[0] if cols else 0
        live = jnp.arange(n, dtype=jnp.int32) < nrows
        lw = Lowerer(schema, cols, live)
        qual = live
        if pred is not None:
            pv = lw.lower(pred, live)
            qual = live & pv.valid & pv.data.astype(jnp.bool_)
        lanes: list[tuple[jnp.ndarray, int]] = [
            ((~qual).astype(jnp.int64), 1)]           # non-matches last
        for sp in specs:
            v = lw.lower(sp.expr, qual)
            lanes.extend(_key_lanes(v, sp))
        nqual = jnp.sum(qual.astype(jnp.int64))
        err = (jnp.max(jnp.where(live, lw.err, jnp.uint8(0))) if n
               else jnp.uint8(0))
        no_ovf = jnp.zeros((), dtype=jnp.bool_)
        kk = min(k, n) if n else 0
        if kk == 0:
            top = jnp.zeros((0,), dtype=jnp.int32)
            return top, tuple(lane[:0] for lane, _ in lanes), nqual, err, no_ovf

        rb = _rbits(n)
        total = sum(w for _, w in lanes)

        if exact or kk > 8192 or kk * 4 >= n:
            perm = packed_argsort(lanes, n)
            top = perm[:kk]
            return (top, tuple(lane[top] for lane, _ in lanes), nqual, err,
                    no_ovf)

        if total + rb <= 63:
            # packed top-k: keys + row id in one word -> all values distinct,
            # one top_k is the exact stable answer.
            wide = jax.lax.broadcasted_iota(jnp.int64, (n,), 0)
            shift = rb
            for lane, w in reversed(lanes):    # lanes are MSB-first
                wide = wide | (lane << shift)
                shift += w
            maxv = jnp.int64((1 << shift) - 1)
            desc, _ = jax.lax.top_k(maxv - wide, kk)
            top = ((maxv - desc) & jnp.int64((1 << rb) - 1)).astype(jnp.int32)
            return (top, tuple(lane[top] for lane, _ in lanes), nqual, err,
                    no_ovf)

        # threshold top-k: 63-bit key prefix (order-preserving truncation)
        prefix = jnp.zeros((n,), dtype=jnp.int64)
        used = 0
        for lane, w in lanes:
            if used >= 63:
                break
            take = min(w, 63 - used)
            prefix = (prefix << take) | (lane >> (w - take))
            used += take
        maxp = jnp.int64((1 << used) - 1)
        desc, _ = jax.lax.top_k(maxp - prefix, kk)
        thresh = maxp - desc[kk - 1]           # k-th smallest prefix
        # every true top-k row has prefix <= thresh (full-key order refines
        # prefix order); qual-failing rows can never win, drop them here so
        # an under-full chunk (nqual < k) can't flood the candidate buffer
        cand = (prefix <= thresh) & qual
        C = min(n, max(512, 2 * _next_pow2(kk)))
        ovf = jnp.sum(cand.astype(jnp.int64)) > jnp.int64(C)
        # static-shape compaction: top_k over (is_cand, rowid) packed words
        iota = jax.lax.broadcasted_iota(jnp.int64, (n,), 0)
        w2 = ((~cand).astype(jnp.int64) << rb) | iota
        max2 = jnp.int64((1 << (rb + 1)) - 1)
        cdesc, _ = jax.lax.top_k(max2 - w2, C)
        cw = max2 - cdesc                      # candidates first, rowid asc
        is_cand = (cw >> rb) == 0
        idx = (cw & jnp.int64((1 << rb) - 1)).astype(jnp.int32)
        glanes: list[tuple[jnp.ndarray, int]] = []
        for li, (lane, w) in enumerate(lanes):
            g = lane[idx]
            if li == 0:                        # non-candidates sort last
                g = jnp.where(is_cand, g, jnp.int64(1))
            glanes.append((g, w))
        perm_c = packed_argsort(glanes, C)     # stable: idx is rowid-asc
        sel = perm_c[:kk]
        top = idx[sel]
        return (top, tuple(g[sel] for g, _ in glanes), nqual, err, ovf)

    return f


def build_sort_fn(schema: Sequence[ColMeta], specs: Sequence[SortSpec]) -> Callable:
    """f(cols, nrows) -> (perm int32[n], err).  perm[:nrows] orders the live
    rows per the sort specs; dead (padding) rows sort last."""
    specs = list(specs)

    def f(cols: tuple, nrows):
        n = cols[0][0].shape[0] if cols else 0
        live = jnp.arange(n, dtype=jnp.int32) < nrows
        lw = Lowerer(schema, cols, live)
        lanes: list[tuple[jnp.ndarray, int]] = [
            ((~live).astype(jnp.int64), 1)]           # dead rows last
        for sp in specs:
            v = lw.lower(sp.expr, live)
            lanes.extend(_key_lanes(v, sp))
        perm = packed_argsort(lanes, n)
        return perm, jnp.max(jnp.where(live, lw.err, jnp.uint8(0)))

    return f
