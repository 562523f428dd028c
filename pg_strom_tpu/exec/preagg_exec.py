"""Streaming pre-aggregation executor.

The end-to-end GpuPreAgg pipeline (reference call stack §3.5): stream chunks,
dispatch the device partial-aggregation kernel with a bounded async window
(min/max_async_chunks analog, gpuscan.c:1087-1125), merge partials on the
host, finalize exactly.  Chunks the device flags (err != 0) or that carry
unrepresentable rows are replayed host-exactly (CpuReCheck tier).
"""

from __future__ import annotations

import collections
from decimal import Decimal
from typing import Any, Optional, Sequence

import numpy as np
import jax

from ..config import config
from ..datastore import Table, Chunk
from ..sqltypes import T, numeric_to_decimal
from ..errors import SqlError
from ..expr.ir import Expr, ColumnRef, referenced_columns, walk
from ..expr.catalog import device_expression_supported
from ..expr.lower_jax import ColMeta, schema_from_chunk_columns
from ..ops.preagg import (
    AggInstance, build_preagg_fn, extract_partials, merge_partials,
)
from ..ops.preagg_mxu import mxu_keys_supported, mxu_dense_supported, \
    mxu_absorb
from .devcache import TCACHE, CachedChunk, chunk_capacity, planes_on_device, fetch_host
from .hostexec import replay_chunk_preagg, canon_group_key, new_state
from ..utils.perfmon import Perfmon
from ..utils.devprog import tiered_capacity

_JIT_CACHE: dict[Any, Any] = {}
_SPLIT_FN = None


def _i64_split_jit():
    """Tiny device program splitting a resident i64 plane into u32 halves
    (the v2 kernel's Mosaic-legal view of 64-bit lanes)."""
    global _SPLIT_FN
    if _SPLIT_FN is None:
        import jax.numpy as jnp

        def s(d):
            u = d.astype(jnp.uint64)
            return ((u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                    (u >> jnp.uint64(32)).astype(jnp.uint32))
        _SPLIT_FN = jax.jit(s)
    return _SPLIT_FN


def _plan_key(schema: Sequence[ColMeta], group_exprs, aggs, pred, G, cap,
              strategy, v2sig=None):
    ssig = tuple((m.name, m.type, m.dict_id) for m in schema)
    return (ssig, tuple(group_exprs), tuple(aggs), pred, G, cap, strategy,
            v2sig)


def _get_jitted(schema, group_exprs, aggs, pred, G, cap, strategy="scatter",
                v2sig=None):
    key = _plan_key(schema, group_exprs, aggs, pred, G, cap, strategy, v2sig)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(build_preagg_fn(schema, group_exprs, aggs, pred, G,
                                     strategy, v2sig=v2sig))
        _JIT_CACHE[key] = fn
    return fn


# Cross-query group-count memo: (key column uids, group expr reprs) ->
# (observed number of groups, observed dense key range | None).  One-hot
# matmul cost scales linearly with the bucket count G — and the fused
# kernel's block-packing factor P = 128/max(G, ncols) cuts MXU cycles
# P-fold (ops/preagg_fused._pick_pack) — so repeated GROUP BYs over
# unchanged data start at a right-sized G instead of
# config.max_groups_device (the tcache analog of the reference's
# cross-query hash-table reuse); column uids pin the data version — any
# mutation assigns fresh uids and drops the memo.  The salt/escalation
# retry ladder (and dense_fail re-dispatch) keeps correctness if the memo
# underestimates.
_GROUP_STATS: dict[tuple, tuple] = {}
_GROUP_STATS_CAP = 4096
# GROUP BYs whose key RANGE exceeded the dense window (sparse keys): skip
# the mxu_dense attempt on later queries instead of re-dispatching per chunk
_DENSE_FAILED: set[tuple] = set()

# winning retry-ladder rung per plan (strategy, G, salt): a collision-prone
# key set otherwise re-runs the salted-bucket ladder — and re-FETCHES each
# rung's full output (~350ms/rung through the tunnel) — on EVERY execution
_LADDER_MEMO: dict[tuple, tuple] = {}
_LADDER_MEMO_CAP = 4096


def _pow2_at_least(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


def _device_supported(pred, group_exprs, aggs) -> bool:
    for e in ([] if pred is None else [pred]) + list(group_exprs):
        if not device_expression_supported(e):
            return False
    for inst in aggs:
        if inst.distinct:
            return False      # agg(DISTINCT x) runs on the host-exact tier
        for a in inst.args:
            if not device_expression_supported(a):
                return False
            # numeric agg args must be plain columns so the display-scale
            # lane is available; computed numerics go host-exact
            if a.type is T.NUMERIC and not isinstance(a, ColumnRef):
                return False
            # text agg args aggregate dict codes: plain columns only (a
            # computed text expr has no single dictionary to decode)
            if a.type in (T.TEXT, T.BPCHAR) and not isinstance(a, ColumnRef):
                return False
    return True


def _key_value_from_planes(t: T, planes, g: int, meta: ColMeta | None):
    data, valid = planes[0], planes[1]
    if not bool(valid[g]):
        return None
    if t is T.NUMERIC:
        return numeric_to_decimal(int(data[g]), int(planes[2][g]), int(planes[3][g]))
    if t in (T.TEXT, T.BPCHAR):
        return meta.dictionary[int(data[g])] if meta and meta.dictionary else None
    if t is T.FLOAT8 and len(planes) >= 3:
        # exact value from the IEEE-bits plane (the f64 lane is emulated)
        return float(np.int64(planes[2][g]).view(np.float64))
    if t in (T.FLOAT4, T.FLOAT8):
        return float(data[g])
    if t is T.BOOL:
        return bool(data[g])
    return int(data[g])


class PreAggExecutor:
    """Aggregate `table` with optional filter and GROUP BY.

    pred / group_exprs / agg args are exprs bound to table.column_names."""

    def __init__(self, table: Table, pred: Optional[Expr],
                 group_exprs: Sequence[Expr], aggs: Sequence[AggInstance],
                 perfmon: Perfmon | None = None, offload: bool = True):
        self.table = table
        self.pred = pred
        self.group_exprs = list(group_exprs)
        self.aggs = list(aggs)
        self.layout_names = table.column_names
        self.perfmon = perfmon or Perfmon()
        # cost-model verdict (plan/cost.py cost_tpupreagg vs cost_hostagg;
        # debug_force_tpupreagg overrides it upstream)
        self.offload = offload
        self._gskey: tuple | None = None
        self._v2 = None

    def run(self) -> list[tuple]:
        """Returns rows: (key_values..., agg_values...) in no defined order."""
        states, displays = self.run_states()
        return self._finalize(states, displays)

    def run_states(self) -> tuple[dict, dict]:
        """Pre-finalize accumulators: states[canon_key] = per-agg state
        dicts, displays[canon_key] = first-seen key values.  Exposed so
        GROUPING SETS can roll coarser sets up from ONE finest-grain
        device pass (merge_partials is the same operation chunk partials
        already merge with)."""
        states: dict[tuple, list[dict]] = {}
        displays: dict[tuple, tuple] = {}

        use_device = (config.enabled and config.enable_tpupreagg
                      and self.offload
                      and _device_supported(self.pred, self.group_exprs, self.aggs))
        pm = self.perfmon

        if self.table.nrows == 0:
            return states, displays

        if not use_device:
            for chunk in self.table.chunks():
                with pm.timer("cpu_fallback"):
                    self._replay(chunk, states, displays)
            return states, displays

        self._gskey = self._gstats_key()
        key_metas = self._key_metas()
        self._agg_dicts = agg_text_dicts(self.aggs, self.table.columns.get)
        # grouped chunks go to the MXU (one-hot matmul) strategy whenever the
        # key types support exact host-side recovery — measured 6-12x faster
        # than scatter on v5e (ops/preagg_mxu.py); otherwise scatter
        kts = [g.type for g in self.group_exprs]
        # dense-key MXU (single int-lane key): bucket index IS the key, no
        # key-recovery matmul columns, no collisions (ops/preagg_mxu.py);
        # chunks whose key range exceeds G-2 re-dispatch the generic 'mxu'
        self._strategy = ("mxu_dense" if mxu_dense_supported(kts)
                          and self._gskey not in _DENSE_FAILED
                          else "mxu" if mxu_keys_supported(kts)
                          else "scatter")
        self._obs_rng: int | None = None
        G = config.max_groups_device
        # with the fused packed kernel, small G is where the MXU speedup
        # lives (P = 128/max(G, ncols) rows per contraction column); without
        # it, sub-128 G just pads back to one MXU block — keep the old floor
        fused_on = (config.use_fused_preagg
                    and (jax.default_backend() != "cpu"
                         or config.force_fused_preagg_cpu))
        floor = 8 if fused_on else 128
        if self._gskey is not None:
            st = _GROUP_STATS.get(self._gskey)
            if st is not None:
                obs, rng_obs = st
                if self._strategy == "mxu_dense" and rng_obs is not None:
                    # dense buckets need exactly range+2 slots (NULL group
                    # at rng+1); dense_fail re-dispatches on data drift
                    G = min(max(floor, _pow2_at_least(rng_obs + 2)),
                            config.max_groups_device)
                else:
                    # 2x headroom over the observed count for hash buckets
                    G = min(max(floor, _pow2_at_least(2 * max(obs, 1))),
                            config.max_groups_device)
        # start at the remembered winning rung for this plan (round 5).
        # The memo key includes the PREDICATE: group stats under another
        # filter can describe a different group population, and a
        # memoized sort rung right-sized for it would push THIS plan
        # straight to host replay (review finding) — drop-on-replay
        # below guards the residual stats mismatch.
        self._salt0 = 0
        self._memo_key = ((self._gskey, repr(self.pred))
                          if self._gskey is not None else None)
        memo = (_LADDER_MEMO.get(self._memo_key)
                if self._memo_key is not None else None)
        self._memo_used = memo is not None
        if memo is not None:
            self._strategy, G, self._salt0 = memo
            if self._strategy == "sort":
                # the final ladder rung ran at max_groups_cap; right-size
                # from the observed group count — the G-slot output pytree
                # is what the ~64MB/s tunnel fetches per chunk (ngroups > G
                # raises CPU_RECHECK, so an undersized clamp degrades
                # exactly, and data drift re-keys the memo via column uids)
                st = _GROUP_STATS.get(self._gskey)
                if st is not None:
                    G = min(G, max(128, _pow2_at_least(2 * max(st[0], 1))))
        cap = chunk_capacity(self.table.nrows)
        self._schema = schema_from_chunk_columns(
            self.layout_names,
            [self.table.columns[nm] for nm in self.layout_names])
        # v2 raw-plane kernel (ops/preagg_fused2.py): dense single-key plans
        # whose shape fits the stats-driven envelope skip the XLA encode
        # pass entirely — measured 2.4x the v1 fused kernel on v5e
        self._v2 = None
        if (self._strategy == "mxu_dense" and fused_on
                and config.use_fused_preagg2):
            from ..ops.preagg_fused2 import derive_v2_plan
            self._v2 = derive_v2_plan(
                [self.table.columns[nm] for nm in self.layout_names],
                self._schema, self.group_exprs, self.aggs, self.pred,
                max_g=config.max_groups_cap)
            if self._v2 is not None:
                G = self._v2.G
        self._G, self._cap = G, cap
        fn = _get_jitted(self._schema, tuple(self.group_exprs),
                         tuple(self.aggs), self.pred, G, cap,
                         strategy=self._strategy,
                         v2sig=self._v2.sig if self._v2 else None)
        # async program build (opencl_devprog.c analog): when the big-chunk
        # program is still compiling, run THIS query at the small fallback
        # tier and let the build finish in the background
        cap2 = tiered_capacity(
            cap, _plan_key(self._schema, tuple(self.group_exprs),
                           tuple(self.aggs), self.pred, G, 0,
                           self._strategy),
            fn, self._shape_args(cap), self.perfmon)
        if cap2 != cap:
            cap = self._cap = cap2

        # dispatch all chunks asynchronously, then read every result back in
        # ONE batched transfer — each separate device->host read costs a full
        # round trip on a tunneled/remote TPU (measured ~50ms each), which
        # dwarfed kernel time.  Streamed (uncached) chunks still drain every
        # max_async_chunks to bound in-flight H2D input transfers.
        pending: list = []
        streamed = 0
        for cc in TCACHE.chunks_for(self.table, self.layout_names, cap, pm):
            if cc.recheck_any:
                with pm.timer("cpu_fallback"):
                    self._replay(cc.host_chunk(self.table), states, displays)
                continue
            with pm.timer("dispatch"):
                if self._v2 is not None:
                    out = pm.device_call("tpupreagg", fn, cc.planes,
                                         np.int32(cc.nrows), np.uint64(0),
                                         self._v2_scal(cc))
                else:
                    out = pm.device_call("tpupreagg", fn, cc.planes,
                                         np.int32(cc.nrows),
                                         np.uint64(self._salt0))
            pending.append((cc, out))
            if not planes_on_device(cc.planes):
                streamed += 1
                if streamed >= config.max_async_chunks:
                    self._drain(pending, states, displays, key_metas)
                    streamed = 0
        self._drain(pending, states, displays, key_metas)
        return states, displays

    def _drain(self, pending, states, displays, key_metas) -> None:
        if not pending:
            return
        with self.perfmon.timer("device_wait"):
            outs_host = fetch_host([o for _, o in pending])
        for (cc, _), oh in zip(pending, outs_host):
            self._consume(cc, oh, states, displays, key_metas)
        pending.clear()

    # ------------------------------------------------------------------

    def _v2_scal(self, cc: CachedChunk) -> dict:
        """Runtime scalars + i64 split planes for one chunk (v2 kernel).

        int64 columns ride as u32 (lo, hi) pairs: split ON DEVICE from the
        resident plane (one pass over HBM, cached in the tcache aux space
        per column version/chunk), or host-side for streamed chunks so the
        tunnel only uploads the pair once."""
        plan = self._v2
        split = {}
        for idx in plan.split_cols:
            nm = self.layout_names[idx]
            col = self.table.columns[nm]
            key = ("i64split", col.uid, cc.capacity, cc.start)
            aux = TCACHE.get_aux(key, self.perfmon)
            if aux is None:
                d = cc.planes[idx][0]
                if isinstance(d, jax.Array):
                    aux = _i64_split_jit()(d)
                    TCACHE.put_aux(key, aux, self.table.name, [col])
                else:
                    u = d.view(np.uint64)
                    aux = ((u & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                           (u >> np.uint64(32)).astype(np.uint32))
            split[idx] = aux
        return {"i": plan.scal_i, "u": plan.scal_u, "f4sc": plan.f4sc,
                "f4e": plan.f4e, "split": split}

    def _shape_args(self, cap: int) -> tuple:
        """ShapeDtypeStruct pytree matching a cap-sized fn(...) call, for
        AOT background builds (utils/devprog.tiered_capacity)."""
        import jax
        probe = Chunk.from_table(self.table, 0, min(self.table.nrows, 8), 8)
        from ..expr.lower_jax import planes_of_column
        shapes = tuple(
            tuple(jax.ShapeDtypeStruct((cap,), p.dtype)
                  for p in planes_of_column(probe.columns[nm]))
            for nm in self.layout_names)
        args = (shapes, jax.ShapeDtypeStruct((), np.int32),
                jax.ShapeDtypeStruct((), np.uint64))
        if self._v2 is not None:
            p = self._v2
            args += ({
                "i": jax.ShapeDtypeStruct(p.scal_i.shape, np.int32),
                "u": jax.ShapeDtypeStruct(p.scal_u.shape, np.uint32),
                "f4sc": jax.ShapeDtypeStruct(p.f4sc.shape, np.float32),
                "f4e": jax.ShapeDtypeStruct(p.f4e.shape, np.int32),
                "split": {i: (jax.ShapeDtypeStruct((cap,), np.uint32),
                              jax.ShapeDtypeStruct((cap,), np.uint32))
                          for i in p.split_cols},
            },)
        return args

    def _key_metas(self) -> list[ColMeta | None]:
        metas = []
        for g in self.group_exprs:
            m = None
            if isinstance(g, ColumnRef) and g.type in (T.TEXT, T.BPCHAR):
                c = self.table.columns.get(g.name)
                if c is not None:
                    m = ColMeta(name=g.name, type=g.type,
                                dictionary=tuple(c.dictionary or ()),
                                dict_id=id(c.dictionary))
            metas.append(m)
        return metas

    def _replay(self, chunk: Chunk, states, displays) -> None:
        replay_chunk_preagg(chunk, self.layout_names, self.pred,
                            self.group_exprs, self.aggs, states, displays)

    def _consume(self, cc: CachedChunk, out, states, displays,
                 key_metas) -> None:
        """Retry ladder per chunk: salted buckets at G, 4x G escalation,
        the exact sort strategy, then host replay."""
        pm = self.perfmon
        # (G, salt) ladder: re-salt once, escalate bucket count (one-hot
        # traffic scales with N*G, so start small), then sort-exact
        ladder = [(self._G, 0x9E3779B97F4A7C15)]
        G2 = min(4 * self._G, config.max_groups_cap)
        if G2 > self._G:
            ladder += [(G2, 0), (G2, 0xC2B2AE3D27D4EB4F)]
        attempt = 0
        overflow = False
        cur_strategy = self._strategy
        cur_g, cur_salt = self._G, int(getattr(self, "_salt0", 0))

        def remember():
            if attempt > 0 and self._memo_key is not None:
                if len(_LADDER_MEMO) >= _LADDER_MEMO_CAP:
                    _LADDER_MEMO.clear()
                _LADDER_MEMO[self._memo_key] = (cur_strategy, cur_g,
                                                cur_salt)
        while True:
            err = int(out["err"])
            if err != 0 or overflow:
                break                                 # -> host replay
            if "mxu_sums" in out:
                if "dense_rng" in out and not bool(
                        np.asarray(out.get("dense_fail", False))):
                    r = int(np.asarray(out["dense_rng"]))
                    self._obs_rng = max(self._obs_rng or 0, r)
                if bool(np.asarray(out.get("dense_fail", False))):
                    # key range exceeded the dense window: one-time
                    # re-dispatch with the generic mxu strategy
                    pm.bump("dense_fallbacks")
                    if self._gskey is not None:
                        _DENSE_FAILED.add(self._gskey)
                    cur_strategy = "mxu"
                    fn = _get_jitted(self._schema, tuple(self.group_exprs),
                                     tuple(self.aggs), self.pred, self._G,
                                     self._cap, strategy="mxu")
                    out = fetch_host(fn(cc.planes, np.int32(cc.nrows),
                                        np.uint64(0)))
                    continue
                collided, overflow = mxu_absorb(
                    out, self.group_exprs, self.aggs, key_metas, states,
                    displays, merge_partials,
                    extract_with_dicts(self.aggs,
                                       getattr(self, "_agg_dicts", None)),
                    canon_group_key, dense_key=cur_strategy == "mxu_dense",
                    recipes=(self._v2.recipes
                             if self._v2 is not None
                             and cur_strategy == "mxu_dense" else None))
                if overflow:
                    continue
                if not collided:
                    pm.bump("device_chunks")
                    remember()
                    return
            else:
                collided = (bool(out.get("collision", False))
                            if self.group_exprs else False)
                if not collided:
                    absorb_preagg_out(out, self.group_exprs, self.aggs,
                                      key_metas, states, displays, pm,
                                      getattr(self, "_agg_dicts", None))
                    remember()
                    return
            if attempt < len(ladder):
                pm.bump("salt_retries")
                g, salt = ladder[attempt]
                cur_g, cur_salt = g, salt
                fn = _get_jitted(self._schema, tuple(self.group_exprs),
                                 tuple(self.aggs), self.pred, g,
                                 self._cap, strategy=cur_strategy)
                out = fetch_host(fn(cc.planes, np.int32(cc.nrows),
                                    np.uint64(salt)))
            elif attempt == len(ladder):
                # distinct keys genuinely share every salted bucket (or
                # more groups than buckets): sort is exact for any key
                # distribution up to max_groups_cap groups
                pm.bump("sort_fallbacks")
                cur_strategy = "sort"
                cur_g, cur_salt = config.max_groups_cap, 0
                fn = _get_jitted(self._schema, tuple(self.group_exprs),
                                 tuple(self.aggs), self.pred,
                                 config.max_groups_cap, self._cap,
                                 strategy="sort")
                out = fetch_host(fn(cc.planes, np.int32(cc.nrows),
                                    np.uint64(0)))
            else:
                break
            attempt += 1
        pm.bump("recheck_chunks")
        if getattr(self, "_memo_used", False) and \
                self._memo_key is not None:
            # a remembered rung that ends in host replay is stale (data
            # or stats drift): drop it so the next run retries the full
            # ladder instead of replaying forever
            _LADDER_MEMO.pop(self._memo_key, None)
        with pm.timer("cpu_fallback"):
            self._replay(cc.host_chunk(self.table), states, displays)

    def _gstats_key(self) -> tuple | None:
        if not self.group_exprs:
            return None
        uids = []
        for g in self.group_exprs:
            for nm in referenced_columns(g):
                c = self.table.columns.get(nm)
                if c is None:
                    return None
                uids.append(c.uid)
        return (tuple(uids), tuple(repr(g) for g in self.group_exprs))

    def _finalize(self, states, displays) -> list[tuple]:
        if self._gskey is not None:
            if len(_GROUP_STATS) >= _GROUP_STATS_CAP:
                _GROUP_STATS.pop(next(iter(_GROUP_STATS)))
            _GROUP_STATS[self._gskey] = (len(states),
                                         getattr(self, "_obs_rng", None))
        return finalize_agg_states(self.group_exprs, self.aggs, states,
                                   displays)


def agg_text_dicts(aggs, resolve) -> list[tuple | None] | None:
    """Per-agg sorted dictionary for min/max over a TEXT/BPCHAR column.

    The device aggregates dict codes (order-preserving dictionary, so code
    order is C-collation string order); extraction decodes code -> string
    so device partials merge with host-replay partials.  ``resolve`` maps
    a column name to its Column (executor-specific: single table, probe or
    build side, fact or dims).  Returns None when no agg needs decoding
    (the common case — keeps the hot path allocation-free)."""
    out: list[tuple | None] = []
    any_ = False
    for inst in aggs:
        d = None
        if inst.aggname in ("min", "max") and inst.args and \
                inst.args[0].type in (T.TEXT, T.BPCHAR) and \
                isinstance(inst.args[0], ColumnRef):
            c = resolve(inst.args[0].name)
            if c is not None and c.dictionary is not None:
                d = tuple(c.dictionary)
                any_ = True
        out.append(d)
    return out if any_ else None


def extract_with_dicts(aggs, agg_dicts):
    """extract_partials bound to per-instance text dictionaries (keyed by
    instance identity so strategy paths that take an extract function —
    mxu_absorb — need no signature change)."""
    if not agg_dicts:
        return extract_partials
    by_id = {id(i): d for i, d in zip(aggs, agg_dicts)}

    def ex(inst, arrays, g, skip=()):
        return extract_partials(inst, arrays, g, skip,
                                text_dict=by_id.get(id(inst)))
    return ex


def absorb_preagg_out(out, group_exprs, aggs, key_metas, states, displays,
                      pm, agg_dicts: list | None = None) -> None:
    """Merge one device preagg output pytree into the host (states, displays)
    accumulators — the partial-merge half of the two-phase contract."""
    with pm.timer("materialize"):
        gmask = np.asarray(out["gmask"])
        keys = [tuple(np.asarray(p) for p in kp) for kp in out["keys"]]
        slots = [{k: np.asarray(v) for k, v in d.items()} for d in out["slots"]]
    pm.bump("device_chunks")
    pm.add_bytes("d2h", sum(a.nbytes for d in slots for a in d.values()))
    groups = np.flatnonzero(gmask) if group_exprs else np.array([0])
    for g in groups:
        g = int(g)
        kvals = tuple(
            _key_value_from_planes(ge.type, kp, g, meta)
            for ge, kp, meta in zip(group_exprs, keys, key_metas))
        ck = tuple(canon_group_key(v) for v in kvals)
        parts = [extract_partials(
                     inst, d, g,
                     text_dict=agg_dicts[i] if agg_dicts else None)
                 for i, (inst, d) in enumerate(zip(aggs, slots))]
        if ck not in states:
            states[ck] = parts
            displays[ck] = kvals
        else:
            st = states[ck]
            states[ck] = [merge_partials(inst, a, b)
                          for inst, a, b in zip(aggs, st, parts)]


def finalize_agg_states(group_exprs, aggs, states, displays) -> list[tuple]:
    # ungrouped aggregate over zero rows still yields one all-NULL row
    if not group_exprs and not states:
        states[()] = [new_state(inst) for inst in aggs]
        displays[()] = ()
    from ..ops.preagg import AGG_CATALOG
    rows = []
    for ck, st in states.items():
        kvals = displays[ck]
        avals = tuple(AGG_CATALOG[(inst.aggname, inst.family)].final(s)
                      for inst, s in zip(aggs, st))
        rows.append(kvals + avals)
    return rows

