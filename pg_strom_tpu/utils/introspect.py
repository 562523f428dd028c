"""Introspection virtual tables.

The reference exposes runtime internals as SQL SRFs
(pgstrom_shmem_info / pgstrom_shmem_active_info / pgstrom_mqueue_info /
pgstrom_opencl_device_info / pgstrom_opencl_program_info — SURVEY §2 rows
2,3,7,9; pg_strom--1.0.sql:9-92).  Here the same surface is a set of
virtual tables materialized on access:

  pgstrom_device_info   — jax devices (platform, kind, id)
  pgstrom_program_info  — the jit plan cache (the devprog cache analog):
                          plan kind, group slots, chunk capacity
  pgstrom_arena_info    — native buddy-arena stats (shmem_info analog)
  pgstrom_config_info   — every GUC with its current value
"""

from __future__ import annotations

from typing import Optional

from ..sqltypes import T
from ..datastore import Table, column_from_values
from ..config import show_all

_ARENAS: list = []   # Arena objects registered for visibility
_MQUEUES: list = []  # (name, MQueue) pairs registered for visibility


def register_arena(a) -> None:
    _ARENAS.append(a)


def register_mqueue(name: str, q) -> None:
    _MQUEUES.append((name, q))


def virtual_table(name: str) -> Optional[Table]:
    if name == "pgstrom_device_info":
        import jax
        devs = jax.devices()
        return Table.from_columns(name, {
            "id": column_from_values(T.INT4, [d.id for d in devs]),
            "platform": column_from_values(T.TEXT, [d.platform for d in devs]),
            "device_kind": column_from_values(
                T.TEXT, [getattr(d, "device_kind", "") for d in devs]),
            "process_index": column_from_values(
                T.INT4, [d.process_index for d in devs]),
        })
    if name == "pgstrom_program_info":
        from ..exec import preagg_exec, join_exec, scan_exec
        rows = []
        for cache, kind in ((preagg_exec._JIT_CACHE, "preagg"),
                            (join_exec._JIT_CACHE, "join"),
                            (scan_exec._JIT_CACHE, "scan")):
            for key in cache:
                rows.append((kind, repr(key)[:120]))
        # asynchronous big-chunk builds (the reference lists build state in
        # its program_info SRF too — opencl_devprog.c:770)
        from .devprog import DEVPROG
        for r in DEVPROG.info_rows():
            rows.append((f"async:{r['state']}",
                         f"{r['key']} ({r['build_s']}s)"))
        return Table.from_columns(name, {
            "kind": column_from_values(T.TEXT, [r[0] for r in rows]),
            "plan_key": column_from_values(T.TEXT, [r[1] for r in rows]),
        })
    if name == "pgstrom_arena_info":
        stats = [a.stats() for a in _ARENAS]
        return Table.from_columns(name, {
            "zone": column_from_values(T.INT4, list(range(len(stats)))),
            "size": column_from_values(T.INT8, [s["size"] for s in stats]),
            "bytes_live": column_from_values(T.INT8, [s["bytes_live"] for s in stats]),
            "n_alloc": column_from_values(T.INT8, [s["n_alloc"] for s in stats]),
            "n_free": column_from_values(T.INT8, [s["n_free"] for s in stats]),
        })
    if name == "pgstrom_slab_info":
        # small-object slab classes over the buddy arena (the
        # pgstrom_shmem_slab_info SRF analog, reference shmem.c:1178-1252)
        rows = []
        for zone, a in enumerate(_ARENAS):
            try:
                for r in a.slab_stats():
                    rows.append((zone, r))
            except Exception:
                continue
        return Table.from_columns(name, {
            "zone": column_from_values(T.INT4, [z for z, _ in rows]),
            "size": column_from_values(T.INT8, [r["size"] for _, r in rows]),
            "n_alloc": column_from_values(T.INT8,
                                          [r["n_alloc"] for _, r in rows]),
            "n_free": column_from_values(T.INT8,
                                         [r["n_free"] for _, r in rows]),
            "n_objects": column_from_values(T.INT8,
                                            [r["n_objects"]
                                             for _, r in rows]),
        })
    if name == "pgstrom_mqueue_info":
        # the pgstrom_mqueue_info SRF analog (reference mqueue.c:592)
        return Table.from_columns(name, {
            "name": column_from_values(T.TEXT, [n for n, _ in _MQUEUES]),
            "depth": column_from_values(T.INT8,
                                        [q.depth() for _, q in _MQUEUES]),
        })
    if name == "pgstrom_tcache_info":
        # device-resident chunk cache (the tcache analog, exec/devcache.py)
        from ..exec.devcache import TCACHE
        rows = TCACHE.info_rows()
        return Table.from_columns(name, {
            "table_name": column_from_values(T.TEXT, [r["table_name"] for r in rows]),
            "kind": column_from_values(T.TEXT, [r["kind"] for r in rows]),
            "nchunks": column_from_values(T.INT4, [r["nchunks"] for r in rows]),
            "nbytes": column_from_values(T.INT8, [r["nbytes"] for r in rows]),
            "hits": column_from_values(T.INT8, [r["hits"] for r in rows]),
        })
    if name == "pgstrom_config_info":
        cfg = show_all()
        keys = sorted(cfg)
        return Table.from_columns(name, {
            "name": column_from_values(T.TEXT, keys),
            "setting": column_from_values(T.TEXT, [str(cfg[k]) for k in keys]),
        })
    return None
