"""Top-level SQL API: execute / explain.

The psql-facing surface.  SET statements map PostgreSQL GUC names
(pg_strom.enabled, pg_strom.debug_force_gpupreagg, extra_float_digits, ...)
onto the config system, so the reference's regression scripts drive this
engine with their SET lines unchanged (input/sql/*.sql:3-7).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

from ..config import config, set_config
from ..datastore import Database
from ..plan.planner import plan_query, plan_select, PlannedQuery
from ..sql import parser as ast
from ..utils.pgformat import value_out


# session-level settings that aren't engine config
_SESSION = {"extra_float_digits": 0}

_GUC_MAP = {
    "pg_strom.enabled": "enabled",
    "pg_strom.enable_gpuscan": "enable_tpuscan",
    "pg_strom.enable_tpuscan": "enable_tpuscan",
    "pg_strom.enable_gpuhashjoin": "enable_tpuhashjoin",
    "pg_strom.enable_tpuhashjoin": "enable_tpuhashjoin",
    "pg_strom.enable_gpupreagg": "enable_tpupreagg",
    "pg_strom.enable_tpupreagg": "enable_tpupreagg",
    "pg_strom.enable_gpusort": "enable_tpusort",
    "pg_strom.debug_force_gpupreagg": "debug_force_tpupreagg",
    "pg_strom.debug_force_tpupreagg": "debug_force_tpupreagg",
    "pg_strom.perfmon": "perfmon",
    "pg_strom.show_device_kernel": "show_device_kernel",
    "pg_strom.chunk_size": "chunk_rows",
    "pg_strom.min_async_chunks": "min_async_chunks",
    "pg_strom.max_async_chunks": "max_async_chunks",
}


@dataclasses.dataclass
class Result:
    columns: list[str]
    rows: list[tuple]
    types: list
    command: str = "SELECT"

    def formatted(self, extra_float_digits: Optional[int] = None) -> list[str]:
        efd = (_SESSION["extra_float_digits"]
               if extra_float_digits is None else extra_float_digits)
        from ..utils.pgformat import row_out
        return [row_out(r, tuple(self.types), efd) for r in self.rows]

    def scalar(self) -> Any:
        return self.rows[0][0] if self.rows else None


def execute(sql: str, db: Database) -> Result:
    stmt = ast.parse(sql)
    if isinstance(stmt, ast.SetStmt):
        _apply_set(stmt)
        return Result(columns=[], rows=[], types=[], command="SET")
    if isinstance(stmt, ast.ExplainStmt):
        pq = plan_query(stmt.query, db)
        text = pq.explain(verbose=stmt.verbose)
        from ..sqltypes import T
        if stmt.analyze:
            # EXPLAIN ANALYZE: run it and append perfmon phases (the
            # pg_strom.perfmon EXPLAIN output analog, main.c:504-660)
            import time as _time
            from ..config import override
            with override(perfmon=True):
                t0 = _time.perf_counter()
                rows = pq.execute()
                dt = (_time.perf_counter() - t0) * 1e3
            text += f"\n(actual rows={len(rows)})"
            for line in pq.perfmon.report_lines():
                text += f"\n  {line}"
            text += f"\nExecution Time: {dt:.3f} ms"
        return Result(columns=["QUERY PLAN"],
                      rows=[(line,) for line in text.splitlines()],
                      types=[T.TEXT], command="EXPLAIN")
    pq = plan_query(stmt, db)
    rows = pq.execute()
    return Result(columns=pq.out_names, rows=rows, types=pq.out_types)


def explain(sql: str, db: Database, verbose: bool = False) -> str:
    stmt = ast.parse(sql)
    if isinstance(stmt, ast.ExplainStmt):
        return plan_query(stmt.query, db).explain(verbose=stmt.verbose or verbose)
    return plan_query(stmt, db).explain(verbose=verbose)


def _apply_set(stmt: ast.SetStmt) -> None:
    name = stmt.name.lower()
    val = stmt.value.strip().strip("'")
    if name == "extra_float_digits":
        _SESSION["extra_float_digits"] = int(val.replace(" ", ""))
        return
    if name in ("client_min_messages",):
        set_config("client_min_messages", val)
        return
    if name in _GUC_MAP:
        set_config(_GUC_MAP[name], val)
        return
    if name.startswith("pg_strom."):
        key = name.split(".", 1)[1]
        try:
            set_config(key, val)
            return
        except KeyError:
            pass
        raise KeyError(f'unrecognized configuration parameter "{name}"')
    # unknown non-engine settings are accepted and ignored (psql compat)
