"""Window functions: func(args) OVER (PARTITION BY ... ORDER BY ...).

The reference runs window functions on the PostgreSQL CPU executor (its
GPU paths cover scan/join/preagg only — gpupreagg.c's aggregate catalog
has no window entries); here the engine IS the database, so WindowAgg is
a host tier layered over the device pipeline, the same split the
reference ships.

Execution is a three-stage desugar that reuses the whole engine:

  1. INNER: the original query minus the window calls, its items replaced
     by the distinct window-free component expressions (__c0..__cN) that
     the select list, the window argument/partition/order expressions,
     and the outer ORDER BY need.  This stage keeps FROM/WHERE/GROUP BY/
     HAVING — so windows over grouped queries, joins and device-offloaded
     scans all work — and is planned by the normal planner (device
     kernels included).
  2. WINDOW: per partition (canon_group_key equality, the GROUP BY/
     DISTINCT canonicalization), rows sort by the window ORDER BY with
     PostgreSQL null ordering, peer groups are rows tied on every sort
     key, and each function computes with PG default-frame semantics
     (RANGE UNBOUNDED PRECEDING..CURRENT ROW with ORDER BY, the whole
     partition without).  Aggregate windows run the SAME exact host
     transition functions as the aggregate engine (hostexec.update_state
     + AGG_CATALOG finals), so sum/avg/stddev/... match PG bit-for-bit.
  3. POST: the rewritten select list (windows -> __wJ columns) over a
     temp table of components + window values, planned by the normal
     planner again — DISTINCT / ORDER BY / LIMIT land here, in PG's
     evaluation order (windows compute before DISTINCT).

Frame clauses, nested windows, DISTINCT inside a window call and
SELECT * alongside a window are rejected up front.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

from ..sqltypes import T
from ..errors import SqlError
from ..sql import parser as ast
from ..pgops import cmp_values
from ..exec.hostexec import canon_group_key, new_state, update_state
from ..ops.preagg import AggInstance, lookup_agg

_RANKERS = ("row_number", "rank", "dense_rank")
_OFFSETS = ("lag", "lead", "first_value", "last_value")


# ---------------------------------------------------------------------------
# detection
# ---------------------------------------------------------------------------

def _contains_window(v: Any) -> bool:
    """Any AWindow in this AST fragment, not descending into subqueries
    (their windows belong to their own SELECT's scope)."""
    if isinstance(v, ast.AWindow):
        return True
    if isinstance(v, (ast.ASubquery, ast.AExists, ast.SelectStmt,
                      ast.SetOpStmt)):
        return False
    if isinstance(v, (list, tuple)):
        return any(_contains_window(x) for x in v)
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        return any(_contains_window(getattr(v, f.name))
                   for f in dataclasses.fields(v))
    return False


def stmt_has_windows(stmt: "ast.SelectStmt") -> bool:
    """True when this SELECT needs the WindowAgg tier; raises for window
    calls in clauses PostgreSQL forbids them in."""
    found = any(_contains_window(it.expr) for it in stmt.items) or \
        any(_contains_window(oi.expr) for oi in stmt.order_by)
    for clause, label in ((stmt.where, "WHERE"),
                          (stmt.group_by, "GROUP BY"),
                          (stmt.having, "HAVING")):
        if clause is not None and _contains_window(clause):
            raise SqlError(
                f"window functions are not allowed in {label}")
    for jc in stmt.joins:
        if jc.on is not None and _contains_window(jc.on):
            raise SqlError("window functions are not allowed in JOIN/ON")
    return found


# ---------------------------------------------------------------------------
# rewrite: windows -> __wJ, window-free subtrees -> __cI
# ---------------------------------------------------------------------------

class _Rewriter:
    def __init__(self):
        self.comps: list = []       # distinct window-free component exprs
        self.wins: list = []        # distinct AWindow nodes

    def comp_idx(self, e) -> int:
        for i, c in enumerate(self.comps):
            if c == e:
                return i
        self.comps.append(e)
        return len(self.comps) - 1

    def _win_ref(self, w: ast.AWindow) -> ast.AName:
        if _contains_window(w.func.args) or _contains_window(w.partition) \
                or _contains_window([oi.expr for oi in w.order]):
            raise SqlError("window function calls cannot be nested")
        for j, c in enumerate(self.wins):
            if c == w:
                return ast.AName((f"__w{j}",))
        self.wins.append(w)
        return ast.AName((f"__w{len(self.wins) - 1}",))

    def rewrite(self, e):
        """Replace every AWindow with its __wJ column and every MAXIMAL
        window-free subtree with a __cI component column (literals stay
        inline — no point shipping constant columns through the inner)."""
        if isinstance(e, ast.AWindow):
            return self._win_ref(e)
        if not _contains_window(e):
            if isinstance(e, ast.ALiteral):
                return e
            return ast.AName((f"__c{self.comp_idx(e)}",))
        if dataclasses.is_dataclass(e) and not isinstance(e, type):
            return dataclasses.replace(e, **{
                f.name: self._rw_val(getattr(e, f.name))
                for f in dataclasses.fields(e)})
        return e

    def _rw_val(self, v):
        if isinstance(v, list):
            return [self._rw_val(x) for x in v]
        if isinstance(v, tuple):
            return tuple(self._rw_val(x) for x in v)
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            return self.rewrite(v)
        return v


@dataclasses.dataclass
class _WinSpec:
    fname: str
    star: bool
    arg_idx: Optional[int]          # component index of arg0 (None: none)
    offset: int                     # lag/lead offset (literal)
    default_idx: Optional[int]      # lag/lead default component
    part_idx: list                  # partition component indexes
    order: list                     # (comp_idx, descending, nulls_first)
    # aggregate windows only, resolved at plan time (ops/preagg catalog)
    _adef: Any = None
    _fam: str = ""


def _build_spec(w: ast.AWindow, rw: _Rewriter) -> _WinSpec:
    f = w.func
    if f.distinct:
        raise SqlError("DISTINCT is not implemented for window functions")
    arg_idx = default_idx = None
    offset = 1
    if f.name in _RANKERS:
        if f.args or f.star:
            raise SqlError(f"{f.name}() takes no arguments")
    elif f.name in _OFFSETS:
        if f.star or not f.args:
            raise SqlError(f"{f.name}() requires an argument")
        arg_idx = rw.comp_idx(f.args[0])
        if f.name in ("lag", "lead"):
            if len(f.args) >= 2:
                off = f.args[1]
                if not (isinstance(off, ast.ALiteral)
                        and isinstance(off.value, int)
                        and not off.is_string):
                    raise SqlError(f"{f.name}() offset must be an integer "
                                   "literal")
                offset = off.value
            if len(f.args) >= 3:
                default_idx = rw.comp_idx(f.args[2])
            if len(f.args) > 3:
                raise SqlError(f"{f.name}() takes at most 3 arguments")
        elif len(f.args) > 1:
            raise SqlError(f"{f.name}() takes 1 argument")
    else:
        # aggregate-as-window: resolved against the engine's AGG_CATALOG
        if not f.star:
            if len(f.args) != 1:
                raise SqlError(f'window aggregate "{f.name}" supports '
                               "exactly one argument")
            arg_idx = rw.comp_idx(f.args[0])
    part_idx = [rw.comp_idx(e) for e in w.partition]
    order = [(rw.comp_idx(oi.expr), oi.descending, oi.nulls_first)
             for oi in w.order]
    return _WinSpec(f.name, f.star, arg_idx, offset, default_idx,
                    part_idx, order)


def _win_type(spec: _WinSpec, ctypes: list) -> T:
    if spec.fname in _RANKERS:
        return T.INT8
    if spec.fname in _OFFSETS:
        return ctypes[spec.arg_idx]
    argts = () if spec.star or spec.arg_idx is None \
        else (ctypes[spec.arg_idx],)
    adef, _fam = lookup_agg(spec.fname, argts, star=spec.star)
    return adef.rettype


# ---------------------------------------------------------------------------
# window computation (PG default-frame semantics)
# ---------------------------------------------------------------------------

def _window_values(spec: _WinSpec, rows: list, ctypes: list) -> list:
    n = len(rows)
    out: list = [None] * n

    parts: dict = {}
    for i in range(n):
        k = tuple(canon_group_key(rows[i][p]) for p in spec.part_idx)
        parts.setdefault(k, []).append(i)

    def cmp_rows(ia: int, ib: int) -> int:
        for idx, desc, nf in spec.order:
            a, b = rows[ia][idx], rows[ib][idx]
            nf_eff = desc if nf is None else nf    # PG default null order
            if a is None or b is None:
                if a is None and b is None:
                    continue
                if a is None:
                    return -1 if nf_eff else 1
                return 1 if nf_eff else -1
            c = cmp_values(a, b)
            if c:
                return -c if desc else c
        return 0

    for idxs in parts.values():
        ordered = (sorted(idxs, key=functools.cmp_to_key(cmp_rows))
                   if spec.order else list(idxs))
        if spec.order:
            groups: list[list[int]] = [[ordered[0]]]
            for prev, i in zip(ordered, ordered[1:]):
                if cmp_rows(prev, i) == 0:
                    groups[-1].append(i)
                else:
                    groups.append([i])
        else:
            groups = [ordered]     # no ORDER BY: the whole partition peers
        _compute_partition(spec, rows, ordered, groups, out)
    return out


def _compute_partition(spec, rows, ordered, groups, out) -> None:
    f = spec.fname
    if f == "row_number":
        for pos, i in enumerate(ordered):
            out[i] = pos + 1
        return
    if f == "rank":
        start = 1
        for g in groups:
            for i in g:
                out[i] = start
            start += len(g)
        return
    if f == "dense_rank":
        for gi, g in enumerate(groups):
            for i in g:
                out[i] = gi + 1
        return
    if f in ("lag", "lead"):
        off = spec.offset if f == "lag" else -spec.offset
        for pos, i in enumerate(ordered):
            j = pos - off
            if 0 <= j < len(ordered):
                out[i] = rows[ordered[j]][spec.arg_idx]
            elif spec.default_idx is not None:
                # PG: the default expression evaluates at the CURRENT row
                out[i] = rows[i][spec.default_idx]
        return
    if f == "first_value":
        fv = rows[ordered[0]][spec.arg_idx]
        for i in ordered:
            out[i] = fv
        return
    if f == "last_value":
        # default frame ends at the CURRENT ROW's last peer (the classic
        # PG last_value gotcha) — whole partition without ORDER BY
        for g in groups:
            lv = rows[g[-1]][spec.arg_idx]
            for i in g:
                out[i] = lv
        return
    # aggregate windows: exact host transitions, running over peer groups
    adef, fam = spec._adef, spec._fam    # resolved at plan time
    inst = AggInstance(aggname=f, family=fam, slots=adef.slots, args=())
    state = new_state(inst)
    for g in groups:
        for i in g:
            args = [] if spec.arg_idx is None \
                else [rows[i][spec.arg_idx]]
            update_state(inst, state, args)
        val = adef.final(state)
        for i in g:
            out[i] = val


# ---------------------------------------------------------------------------
# the WindowAgg plan
# ---------------------------------------------------------------------------

def _untyped_name(e) -> str:
    if isinstance(e, ast.AName):
        return e.parts[-1]
    if isinstance(e, ast.AWindow):
        return e.func.name
    if isinstance(e, ast.AFunc):
        return e.name
    if isinstance(e, ast.ACast):
        return _untyped_name(e.arg)
    return "?column?"


class _TempDb:
    """Single-table database view for the POST stage."""

    def __init__(self, tbl):
        self._tbl = tbl
        self.tables = {tbl.name: tbl}

    def get(self, name: str):
        if name == self._tbl.name:
            return self._tbl
        raise KeyError(f'relation "{name}" does not exist')


def _temp_table(schema: list, data: dict):
    from ..datastore import Table, column_from_values
    return Table.from_columns("__winsrc__", {
        nm: column_from_values(t, data.get(nm, [])) for nm, t in schema})


def plan_windowed(stmt: "ast.SelectStmt", db):
    """Plan a SELECT containing window functions (see module docstring)."""
    from .planner import plan_query, PlannedQuery, PlanNode, Perfmon

    rw = _Rewriter()
    post_items: list = []
    out_aliases: list[str] = []
    for it in stmt.items:
        if isinstance(it.expr, ast.AStar):
            raise SqlError("SELECT * together with window functions is not "
                           "supported; list the columns explicitly")
        name = it.alias or _untyped_name(it.expr)
        out_aliases.append(name)
        post_items.append(ast.SelectItem(rw.rewrite(it.expr), name))

    # outer ORDER BY: resolve output aliases / ordinals to the rewritten
    # item exprs (they may not exist as columns of the temp table), then
    # rewrite anything else through the same component machinery
    post_order: list = []
    for oi in stmt.order_by:
        e, target = oi.expr, None
        if isinstance(e, ast.ALiteral) and isinstance(e.value, int) \
                and not e.is_string:
            if not (1 <= e.value <= len(post_items)):
                raise SqlError(f"ORDER BY position {e.value} is not in "
                               "select list")
            target = post_items[e.value - 1].expr
        elif isinstance(e, ast.AName) and len(e.parts) == 1 \
                and e.parts[0] in out_aliases:
            target = post_items[out_aliases.index(e.parts[0])].expr
        if target is None:
            target = rw.rewrite(e)
        post_order.append(dataclasses.replace(oi, expr=target))

    specs = [_build_spec(w, rw) for w in rw.wins]

    comps = rw.comps or [ast.ALiteral(1)]      # SELECT rn() OVER () FROM t
    inner = dataclasses.replace(
        stmt,
        items=[ast.SelectItem(c, f"__c{i}") for i, c in enumerate(comps)],
        order_by=[], limit=None, offset=None, distinct=False, ctes=[])
    ipq = plan_query(inner, db)
    ctypes = list(ipq.out_types)

    wtypes = []
    for spec in specs:
        wtypes.append(_win_type(spec, ctypes))
        if spec.fname not in _RANKERS and spec.fname not in _OFFSETS:
            argts = () if spec.star or spec.arg_idx is None \
                else (ctypes[spec.arg_idx],)
            spec._adef, spec._fam = lookup_agg(spec.fname, argts,
                                               star=spec.star)

    schema = [(f"__c{i}", t) for i, t in enumerate(ctypes)] + \
             [(f"__w{j}", t) for j, t in enumerate(wtypes)]
    post_stmt = ast.SelectStmt(
        post_items, [ast.TableRef("__winsrc__", None, None)], [], None,
        [], None, post_order, stmt.limit, stmt.offset,
        distinct=stmt.distinct)
    shell = plan_query(post_stmt, _TempDb(_temp_table(schema, {})))
    out_names, out_types = list(shell.out_names), list(shell.out_types)

    def run() -> list[tuple]:
        rows = ipq.execute()
        data = {f"__c{i}": [r[i] for r in rows]
                for i in range(len(ctypes))}
        for j, spec in enumerate(specs):
            data[f"__w{j}"] = _window_values(spec, rows, ctypes)
        tdb = _TempDb(_temp_table(schema, data))
        return plan_query(post_stmt, tdb).execute()

    root = PlanNode(
        "WindowAgg",
        {"functions": ", ".join(
            s.fname + ("(*)" if s.star else "") +
            (" partition" if s.part_idx else "") +
            (" order" if s.order else "") for s in specs)},
        [ipq.root])
    return PlannedQuery(out_names, out_types, run, root, ipq.perfmon)
