"""Streaming scan executor: device filter + row materialization.

The GpuScan execution path (reference §3.3): chunked load -> device qual
kernel -> compacted row indexes -> materialize matching rows.  Chunks whose
error lane fires are replayed with exact host predicate evaluation
(gpuscan_next_tuple negative-rindex CPU recheck analog, gpuscan.c:999-1056).
Chunk planes come from the device-resident cache (exec/devcache.py, the
tcache analog) so repeated scans skip host slicing and re-upload.
"""

from __future__ import annotations

import collections
from typing import Any, Optional, Sequence

import numpy as np
import jax

from ..config import config
from ..datastore import Table, Chunk
from ..expr.ir import Expr
from ..expr.catalog import device_expression_supported
from ..expr.eval_cpu import eval_expr_cpu
from ..expr.lower_jax import schema_from_chunk_columns, planes_of_column
from ..ops.filter import build_filter_compact_fn
from .devcache import TCACHE, CachedChunk, chunk_capacity, planes_on_device, fetch_host
from ..utils.perfmon import Perfmon

_JIT_CACHE: dict[Any, Any] = {}

# a tunneled TPU streams ONE large device->host buffer pathologically slowly
# (4MB leaf measured 23s) but fetches many smaller leaves in parallel at full
# rate (16x256KB in 150ms) — split the row-id output before transfer
_D2H_PIECES = 16


def _split_row_ids(fn):
    import jax.numpy as jnp

    def g(cols, nrows):
        row_ids, nmatch, err = fn(cols, nrows)
        return tuple(jnp.array_split(row_ids, _D2H_PIECES)), nmatch, err
    return g


class ScanExecutor:
    """Yields global row indexes of `table` passing `pred` (None = all)."""

    def __init__(self, table: Table, pred: Optional[Expr],
                 perfmon: Perfmon | None = None):
        self.table = table
        self.pred = pred
        self.perfmon = perfmon or Perfmon()

    def row_indexes(self) -> list[int]:
        t = self.table
        if t.nrows == 0:
            return []
        if self.pred is None:
            return list(range(t.nrows))
        use_device = (config.enabled and config.enable_tpuscan
                      and device_expression_supported(self.pred))
        out: list[int] = []
        pm = self.perfmon
        if not use_device:
            for chunk in t.chunks():
                with pm.timer("cpu_fallback"):
                    out.extend(self._replay(chunk))
            return out
        names = t.column_names
        schema = schema_from_chunk_columns(names, [t.columns[n] for n in names])
        cap = chunk_capacity(t.nrows)
        key = ("scan", tuple((m.name, m.type, m.dict_id) for m in schema),
               self.pred, cap)
        fn = _JIT_CACHE.get(key)
        if fn is None:
            fn = jax.jit(_split_row_ids(build_filter_compact_fn(self.pred,
                                                                schema)))
            _JIT_CACHE[key] = fn
        # dispatch all chunks, read results back in batched transfers (one
        # device->host read per drain, not 3 per chunk — round trips on a
        # tunneled TPU cost ~50ms each); streamed chunks drain every
        # max_async_chunks to bound in-flight input transfers
        pending: list = []
        streamed = 0
        for cc in TCACHE.chunks_for(t, names, cap, pm):
            if cc.recheck_any:
                with pm.timer("cpu_fallback"):
                    out.extend(self._replay(cc.host_chunk(t)))
                continue
            with pm.timer("dispatch"):
                res = fn(cc.planes, np.int32(cc.nrows))
            pending.append((cc, res))
            if not planes_on_device(cc.planes):
                streamed += 1
                if streamed >= config.max_async_chunks:
                    self._drain(pending, out)
                    streamed = 0
        self._drain(pending, out)
        return out

    def _drain(self, pending, out: list[int]) -> None:
        if not pending:
            return
        with self.perfmon.timer("device_wait"):
            results = fetch_host([r for _, r in pending])
        for (cc, _), rh in zip(pending, results):
            out.extend(self._consume(cc, rh))
        pending.clear()

    def _consume(self, cc: CachedChunk, res) -> list[int]:
        pm = self.perfmon
        row_pieces, nmatch, err = res
        if int(err) != 0:
            pm.bump("recheck_chunks")
            with pm.timer("cpu_fallback"):
                return self._replay(cc.host_chunk(self.table))
        pm.bump("device_chunks")
        ids = np.concatenate(row_pieces)[:int(nmatch)]
        return list((ids.astype(np.int64) + cc.start))

    def _replay(self, chunk: Chunk) -> list[int]:
        names = self.table.column_names
        cols = [chunk.columns[n] for n in names]
        out = []
        for i in range(chunk.nrows):
            if eval_expr_cpu(self.pred, lambda s: cols[s].get(i)) is True:
                out.append(chunk.start + i)
        return out
