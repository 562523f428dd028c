"""ORDER BY device sort vs PG-semantics python sort."""

from decimal import Decimal
import math

import numpy as np
import pytest

import pg_strom_tpu  # noqa: F401
import jax

from pg_strom_tpu import T
from pg_strom_tpu.datastore import column_from_values
from pg_strom_tpu.expr.ir import ColumnRef, bind_columns
from pg_strom_tpu.expr.lower_jax import (
    schema_from_chunk_columns, planes_of_column,
)
from pg_strom_tpu.ops.sort import SortSpec, build_sort_fn
from pg_strom_tpu.pgops import cmp_values
import functools


def pg_sort_key(specs_meta):
    def cmp(ra, rb):
        for i, (desc, nulls_first) in enumerate(specs_meta):
            va, vb = ra[i], rb[i]
            if va is None and vb is None:
                continue
            if va is None:
                return -1 if nulls_first else 1
            if vb is None:
                return 1 if nulls_first else -1
            c = cmp_values(va, vb)
            if c:
                return -c if desc else c
        return 0
    return functools.cmp_to_key(cmp)


def run_sort(cols_spec, specs):
    names = [n for n, _, _ in cols_spec]
    cols = [column_from_values(t, vs) for _, t, vs in cols_spec]
    n = len(cols_spec[0][2])
    layout = {nm: i for i, nm in enumerate(names)}
    bound = [SortSpec(bind_columns(s.expr, layout), s.descending, s.nulls_first)
             for s in specs]
    schema = schema_from_chunk_columns(names, cols)
    fn = jax.jit(build_sort_fn(schema, bound))
    planes = tuple(planes_of_column(c) for c in cols)
    perm, err, fits = fn(planes, np.int32(n))
    if not bool(fits):
        fn2 = jax.jit(build_sort_fn(schema, bound, adaptive=False))
        perm, err, _ = fn2(planes, np.int32(n))
    assert int(err) == 0
    perm = np.asarray(perm)[:n]

    got = [tuple(cols[layout[s.expr.name]].get(int(p)) for s in specs)
           for p in perm]
    rows = [tuple(cols[layout[s.expr.name]].get(i) for s in specs)
            for i in range(n)]
    want = sorted(rows, key=pg_sort_key([(s.descending, s.nulls_go_first())
                                         for s in specs]))
    return got, want


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


class TestSort:
    def test_int_asc_nulls_last(self):
        spec = [("a", T.INT4, [5, None, 3, 3, -7, None, 0])]
        got, want = run_sort(spec, [SortSpec(ColumnRef(type=T.INT4, name="a"))])
        assert got == want

    def test_int_desc_nulls_first(self):
        spec = [("a", T.INT4, [5, None, 3, 3, -7, None, 0])]
        got, want = run_sort(spec, [SortSpec(ColumnRef(type=T.INT4, name="a"),
                                             descending=True)])
        assert got == want

    def test_multikey(self):
        rng = np.random.default_rng(5)
        a = [int(rng.integers(0, 4)) if rng.random() > 0.1 else None
             for _ in range(200)]
        b = [float(rng.random()) if rng.random() > 0.1 else None
             for _ in range(200)]
        spec = [("a", T.INT4, a), ("b", T.FLOAT8, b)]
        got, want = run_sort(spec, [
            SortSpec(ColumnRef(type=T.INT4, name="a")),
            SortSpec(ColumnRef(type=T.FLOAT8, name="b"), descending=True)])
        assert got == want

    def test_float8_nan_and_zeros(self):
        vals = [1.5, -0.0, 0.0, float("nan"), -2.5, None, float("inf"),
                float("-inf"), 1e-300]
        spec = [("x", T.FLOAT8, vals)]
        got, want = run_sort(spec, [SortSpec(ColumnRef(type=T.FLOAT8, name="x"))])
        assert [norm(g[0]) for g in got] == [norm(w[0]) for w in want]

    def test_numeric(self):
        vals = [Decimal("1.5"), Decimal("-22"), None, Decimal("0.0001"),
                Decimal("1.50"), Decimal("1e10"), Decimal("-1e10"), Decimal("0")]
        spec = [("x", T.NUMERIC, vals)]
        got, want = run_sort(spec, [SortSpec(ColumnRef(type=T.NUMERIC, name="x"))])
        assert got == want

    def test_text(self):
        vals = ["pear", "apple", None, "Apple", "apple2", ""]
        spec = [("s", T.TEXT, vals)]
        got, want = run_sort(spec, [SortSpec(ColumnRef(type=T.TEXT, name="s"))])
        assert got == want

    def test_float4(self):
        vals = [1.5, -0.0, 0.0, -2.5, None, 3.25]
        spec = [("x", T.FLOAT4, vals)]
        got, want = run_sort(spec, [SortSpec(ColumnRef(type=T.FLOAT4, name="x"),
                                             descending=True)])
        assert got == want


def run_topk(cols_spec, specs, k, exact=False):
    from pg_strom_tpu.ops.sort import build_sort_topk_fn
    names = [n for n, _, _ in cols_spec]
    cols = [column_from_values(t, vs) for _, t, vs in cols_spec]
    n = len(cols_spec[0][2])
    layout = {nm: i for i, nm in enumerate(names)}
    bound = [SortSpec(bind_columns(s.expr, layout), s.descending, s.nulls_first)
             for s in specs]
    schema = schema_from_chunk_columns(names, cols)
    fn = jax.jit(build_sort_topk_fn(schema, bound, None, k, exact=exact))
    planes = tuple(planes_of_column(c) for c in cols)
    top, tops, nqual, err, ovf = fn(planes, np.int32(n))
    assert int(err) == 0
    assert int(nqual) == n
    top = np.asarray(top)
    got = [tuple(cols[layout[s.expr.name]].get(int(p)) for s in specs)
           for p in top]
    rows = [tuple(cols[layout[s.expr.name]].get(i) for s in specs)
            for i in range(n)]
    want = sorted(rows, key=pg_sort_key([(s.descending, s.nulls_go_first())
                                         for s in specs]))[:min(k, n)]
    return got, want, bool(np.asarray(ovf))


class TestTopK:
    """build_sort_topk_fn's three strategies (packed / threshold / exact)."""

    def test_packed_topk_int4(self):
        # 1(qual)+1(null)+32 key bits + rbits fits one word -> packed path
        rng = np.random.default_rng(11)
        vals = [int(v) if rng.random() > 0.05 else None
                for v in rng.integers(-1000, 1000, 4096)]
        got, want, ovf = run_topk([("a", T.INT4, vals)],
                                  [SortSpec(ColumnRef(type=T.INT4, name="a"))],
                                  k=37)
        assert not ovf and got == want

    def test_threshold_topk_float8(self):
        # 66 key bits -> threshold path; continuous data, few prefix ties
        rng = np.random.default_rng(12)
        vals = [float(v) if rng.random() > 0.05 else None
                for v in rng.standard_normal(4096)]
        got, want, ovf = run_topk(
            [("x", T.FLOAT8, vals)],
            [SortSpec(ColumnRef(type=T.FLOAT8, name="x"), descending=True)],
            k=50)
        assert not ovf and got == want

    def test_threshold_topk_multikey(self):
        rng = np.random.default_rng(13)
        n = 4096
        a = [int(v) for v in rng.integers(0, 8, n)]
        b = [float(v) if rng.random() > 0.1 else None
             for v in rng.standard_normal(n)]
        got, want, ovf = run_topk(
            [("a", T.INT4, a), ("b", T.FLOAT8, b)],
            [SortSpec(ColumnRef(type=T.INT4, name="a"), descending=True),
             SortSpec(ColumnRef(type=T.FLOAT8, name="b"))],
            k=64)
        assert not ovf and got == want

    def test_threshold_overflow_flags_and_exact_matches(self):
        # constant key: every row ties at the threshold prefix -> ovf set;
        # the exact=True variant (what the planner re-runs) must be right
        n = 4096
        vals = [1.0] * n
        spec = [("x", T.FLOAT8, vals)]
        ss = [SortSpec(ColumnRef(type=T.FLOAT8, name="x"))]
        _, _, ovf = run_topk(spec, ss, k=50)
        assert ovf
        got, want, ovf2 = run_topk(spec, ss, k=50, exact=True)
        assert not ovf2 and got == want


class TestLexsortRows:
    """_lexsort_rows (vectorized host ORDER BY) must match the python
    comparison sort exactly — including NULL placement, DESC, NaN ordering
    (greatest, PG float8_cmp/numeric), -0 == +0 ties, text C collation,
    and Decimal NaN (unhashable)."""

    def _check(self, rows, specs):
        import pg_strom_tpu.sql  # settle plan/binder circular import
        from pg_strom_tpu.plan.planner import _lexsort_rows, _cmp_sort_rows
        getter = lambda r, i: r[i]
        got = _lexsort_rows(rows, specs, getter)
        want = _cmp_sort_rows(rows, specs, getter)
        assert got == want

    def test_floats_nan_zero_nulls(self, rng):
        vals = ([float(v) for v in rng.standard_normal(500)]
                + [float("nan"), float("inf"), float("-inf"), -0.0, 0.0]
                + [None] * 17)
        rows = [(v, i) for i, v in enumerate(vals)]
        for desc in (False, True):
            for nf in (None, True, False):
                self._check(list(rows), [(0, desc, nf)])

    def test_ints_desc_minmax(self, rng):
        vals = ([int(v) for v in rng.integers(-100, 100, 300)]
                + [-(1 << 63), (1 << 63) - 1, None])
        rows = [(v, i) for i, v in enumerate(vals)]
        self._check(list(rows), [(0, True, None)])
        self._check(list(rows), [(0, False, None)])

    def test_decimal_with_nan(self, rng):
        from decimal import Decimal
        vals = ([Decimal(int(v)) / 100 for v in rng.integers(-9999, 9999, 300)]
                + [Decimal("NaN"), Decimal("NaN"), None])
        rows = [(v, i) for i, v in enumerate(vals)]
        self._check(list(rows), [(0, False, None)])
        self._check(list(rows), [(0, True, False)])

    def test_text_c_collation(self, rng):
        pool = ["abc", "ABC", "", "zz", "Z", "étude", "e", None]
        rows = [(pool[int(i)], j) for j, i in
                enumerate(rng.integers(0, len(pool), 400))]
        self._check(list(rows), [(0, False, None)])
        self._check(list(rows), [(0, True, None)])

    def test_multikey_stability(self, rng):
        rows = [(int(a), float(b), i) for i, (a, b) in
                enumerate(zip(rng.integers(0, 5, 500),
                              rng.integers(0, 3, 500).astype(float)))]
        self._check(list(rows), [(0, True, None), (1, False, None)])

    def test_huge_int_fallback(self):
        rows = [((1 << 70), 0), (5, 1), (None, 2), (-(1 << 70), 3)] * 30
        self._check(list(rows), [(0, False, None)])


class TestVectorizedOrderBy:
    """The plain-column ORDER BY fast path (_order_indexes: np.lexsort over
    encoded planes) must order identically to the exact row-loop path."""

    def _db(self, rng):
        from decimal import Decimal
        from pg_strom_tpu import Table, column_from_values
        from pg_strom_tpu.datastore import Database
        n = 2000
        db = Database()
        db.create(Table.from_columns("t", {
            "i": column_from_values(T.INT4, [
                int(v) if v < 90 else None for v in rng.integers(0, 100, n)]),
            "f": column_from_values(T.FLOAT8, [
                None if v < 0.02 else (float("nan") if v < 0.05 else
                                       (0.0 if v < 0.08 else float(v - 0.5)))
                for v in rng.random(n)]),
            "s": column_from_values(T.TEXT, [
                None if v < 0.1 else f"s{int(v*8)}" for v in rng.random(n)]),
            "m": column_from_values(T.NUMERIC, [
                None if v < 0.05 else Decimal(f"{v*1000-500:.3f}")
                for v in rng.random(n)]),
        }))
        return db

    @pytest.mark.parametrize("order", [
        "i", "i desc", "f", "f desc nulls last", "s desc", "m", "m desc",
        "i desc, f", "s, m desc", "f nulls first, i"])
    def test_matches_row_loop(self, rng, order):
        from pg_strom_tpu.sql import execute
        from pg_strom_tpu import override
        db = self._db(rng)
        q = f"select i, f, s, m from t order by {order}"
        got = execute(q, db).rows
        with override(enabled=False):
            want = execute(q, db).rows

        def canon(rows):
            # NaN != NaN in tuple compares; fold for comparison
            return [tuple("NaN" if isinstance(v, float) and v != v else v
                          for v in r) for r in rows]
        assert canon(got) == canon(want)


class TestHybridAdaptiveSort:
    """_argsort_hybrid: the adaptive single-pass (runtime range-reduced
    widths) and the static LSD multi-pass must produce identical stable
    permutations; narrow multi-key data takes the single pass."""

    def _run(self, coldefs, specs_def, n=4000, seed=0):
        import numpy as np
        import jax
        from pg_strom_tpu.expr.lower_jax import ColMeta
        from pg_strom_tpu.expr.ir import ColumnRef
        from pg_strom_tpu.ops.sort import build_sort_fn, SortSpec
        rng = np.random.default_rng(seed)
        schema, cols, pycols = [], [], []
        for i, (name, t, lo, hi, nullfrac) in enumerate(coldefs):
            if t is T.FLOAT8:
                data = rng.random(n) * (hi - lo) + lo
            else:
                data = rng.integers(lo, hi, n).astype(np.int64)
                if t is T.INT4:
                    data = data.astype(np.int32)
            valid = rng.random(n) >= nullfrac
            schema.append(ColMeta(name, t))
            cols.append((data, valid))
            pycols.append([None if not v else
                           (float(d) if t is T.FLOAT8 else int(d))
                           for d, v in zip(data, valid)])
        specs = [SortSpec(ColumnRef(type=schema[i].type, name=schema[i].name,
                                    index=i), desc, nf)
                 for i, desc, nf in specs_def]
        fn = jax.jit(build_sort_fn(schema, specs))
        perm, err, fits = fn(tuple(cols), np.int32(n))
        if not bool(fits):
            import jax as _jax
            fn2 = _jax.jit(build_sort_fn(schema, specs, adaptive=False))
            perm, err, fits2 = fn2(tuple(cols), np.int32(n))
            assert bool(fits2)
        perm = np.asarray(perm)[:n]
        assert int(err) == 0

        # host-truth stable sort
        import functools
        def cmp(a, b):
            for i, desc, nf in specs_def:
                va, vb = pycols[i][a], pycols[i][b]
                nulls_first = desc if nf is None else nf
                if va is None and vb is None:
                    continue
                if va is None:
                    return -1 if nulls_first else 1
                if vb is None:
                    return 1 if nulls_first else -1
                if va != vb:
                    c = -1 if va < vb else 1
                    return -c if desc else c
            return 0
        want = sorted(range(n), key=functools.cmp_to_key(cmp))
        assert list(perm) == want

    def test_narrow_two_key_single_pass(self):
        self._run([("a", T.INT4, 0, 1000, 0.05),
                   ("b", T.INT8, -500, 500, 0.05)],
                  [(0, False, None), (1, True, None)])

    def test_small_range_int8_keys_fit(self):
        # 64-bit columns whose runtime range is tiny: adaptive reduction
        # packs them into one word
        self._run([("a", T.INT8, 10**15, 10**15 + 300, 0.0),
                   ("b", T.INT8, -(10**17), -(10**17) + 99, 0.1)],
                  [(0, False, None), (1, False, None)])

    def test_wide_keys_force_multipass(self):
        # full-range 64-bit keys cannot fit: the cond takes the LSD branch
        self._run([("a", T.INT8, -(2**62), 2**62, 0.02),
                   ("b", T.INT8, -(2**62), 2**62, 0.02)],
                  [(0, False, None), (1, True, True)])

    def test_three_keys_mixed_float(self):
        self._run([("a", T.INT4, 0, 50, 0.1),
                   ("x", T.FLOAT8, -1e6, 1e6, 0.1),
                   ("b", T.INT2, -100, 100, 0.0)],
                  [(0, True, False), (1, False, None), (2, True, None)])


class TestTwoWordAdaptive:
    """Two-word lexicographic tier (_argsort_adaptive2): wide key sets sort
    gather-free; permutation must equal the static LSD answer exactly."""

    def _run(self, cols_spec, n=4000, seed=11):
        import jax
        from pg_strom_tpu.expr.lower_jax import ColMeta
        from pg_strom_tpu.ops.sort import build_sort_fn, SortSpec
        from pg_strom_tpu.expr.ir import ColumnRef
        rng = np.random.default_rng(seed)
        schema, cols, planes = [], [], []
        for i, (nm, t, lohi, desc, nulls) in enumerate(cols_spec):
            schema.append(ColMeta(nm, t))
            cols.append(SortSpec(ColumnRef(type=t, name=nm, index=i),
                                 descending=desc))
            data = rng.integers(lohi[0], lohi[1], n).astype(
                np.int64 if t is T.INT8 else np.int32)
            valid = (rng.random(n) > 0.1) if nulls else np.ones(n, np.bool_)
            planes.append((jax.device_put(data), jax.device_put(valid)))
        planes = tuple(planes)
        fn2 = jax.jit(build_sort_fn(schema, cols, adaptive=2))
        p2, e2, fits2 = fn2(planes, np.int32(n))
        fn0 = jax.jit(build_sort_fn(schema, cols, adaptive=False))
        p0, e0, _ = fn0(planes, np.int32(n))
        return (np.asarray(p2), bool(np.asarray(fits2)), np.asarray(p0))

    def test_wide_three_keys_match_static(self):
        p2, fits2, p0 = self._run([
            ("a", T.INT8, (0, 1 << 32), True, True),
            ("b", T.INT8, (-(1 << 31), 1 << 31), False, False),
            ("c", T.INT8, (0, 1 << 30), False, True)])
        assert fits2
        assert (p2 == p0).all()

    def test_narrow_keys_also_exact(self):
        p2, fits2, p0 = self._run([
            ("a", T.INT4, (0, 50), False, True),
            ("b", T.INT4, (-7, 7), True, False)])
        assert fits2
        assert (p2 == p0).all()

    def test_too_wide_reports_not_fits(self):
        p2, fits2, p0 = self._run([
            ("a", T.INT8, (0, (1 << 62)), False, False),
            ("b", T.INT8, (0, (1 << 62)), False, False),
            ("c", T.INT8, (0, (1 << 62)), False, False)])
        assert not fits2
