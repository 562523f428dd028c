"""ORDER BY: multi-key device sort.

The reference kept GpuSort in deadcode (deadcode/gpusort.c: CustomPlan Sort
replacement with bitonic kernels) but it is part of the capability envelope
and the BASELINE configs include ORDER BY — here it is first-class.

TPU-native design: one `jax.lax.sort` call over composite key lanes
(lexicographic, num_keys=k, stable) instead of a hand-scheduled bitonic
ladder — XLA's sort is already the tuned device sort.  Each SQL sort key
becomes (null_lane, order_lane...) int64 lanes encoding PG ORDER BY
semantics:

  ASC  [NULLS LAST  default] : null_lane = isnull
  DESC [NULLS FIRST default] : key lanes bit-inverted, null_lane = ~isnull
  floats: exact IEEE total-order keys (NaN greatest — PG float btree order)
  numeric: two lanes (magnitude class, normalized mantissa) — exact
  text: order-preserving dictionary codes (C collation)

The sort returns a permutation; consumers gather column planes through it.
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


def _order_lanes(v: DVal) -> list[jnp.ndarray]:
    """int64 lanes whose lexicographic ascending order == SQL ascending."""
    if v.t is T.NUMERIC:
        from .preagg import _num_sort_keys
        p, s = _num_sort_keys(v.data, v.exp)
        return [p, s]
    if v.t is T.FLOAT8:
        bits = getattr(v, "bits", None)
        if bits is not None:
            return [_f64_orderkey(bits)]
        return [_f64_orderkey(jax.lax.bitcast_convert_type(
            v.data.astype(jnp.float64), jnp.int64))]
    if v.t is T.FLOAT4:
        b32 = jax.lax.bitcast_convert_type(v.data.astype(jnp.float32), jnp.int32)
        b32 = jnp.where(b32 == jnp.int32(-(1 << 31)), jnp.int32(0), b32)
        expm = jnp.int32(0x7F800000)
        isn = ((b32 & expm) == expm) & ((b32 & jnp.int32(0x007FFFFF)) != 0)
        b32 = jnp.where(isn, jnp.int32(0x7FC00000), b32)
        key = jnp.where(b32 < 0, jnp.int32(-1) - (b32 & jnp.int32(0x7FFFFFFF)), b32)
        return [key.astype(jnp.int64)]
    return [v.data.astype(jnp.int64)]


def build_sort_fn(schema: Sequence[ColMeta], specs: Sequence[SortSpec]) -> Callable:
    """f(cols, nrows) -> (perm int32[n], err).  perm[:nrows] orders the live
    rows per the sort specs; dead (padding) rows sort last."""
    specs = list(specs)

    def f(cols: tuple, nrows):
        n = cols[0][0].shape[0] if cols else 0
        live = jnp.arange(n, dtype=jnp.int32) < nrows
        lw = Lowerer(schema, cols, live)
        lanes: list[jnp.ndarray] = [(~live).astype(jnp.int64)]  # dead last
        for sp in specs:
            v = lw.lower(sp.expr, live)
            isnull = (~v.valid).astype(jnp.int64)
            null_lane = isnull if not sp.nulls_go_first() else -isnull
            lanes.append(null_lane)
            for lane in _order_lanes(v):
                lanes.append(jnp.where(v.valid, ~lane if sp.descending else lane,
                                       jnp.int64(0)))
        idx = jnp.arange(n, dtype=jnp.int32)
        sorted_ops = jax.lax.sort(tuple(lanes) + (idx,),
                                  num_keys=len(lanes), is_stable=True)
        perm = sorted_ops[-1]
        return perm, jnp.max(jnp.where(live, lw.err, jnp.uint8(0)))

    return f
