"""Outer joins, DISTINCT, UNION, and DISTINCT aggregates.

The reference accelerates only inner equi-joins and plain aggregates
(gpuhashjoin.c, gpupreagg.c) and leaves the rest to PostgreSQL; here the
engine IS the database, so these shapes are first-class.  Semantics are
asserted against hand-derived PostgreSQL results.
"""

import numpy as np
import pytest

from pg_strom_tpu import T, Table, column_from_values
from pg_strom_tpu.sql import execute
from pg_strom_tpu.datastore import Database
from pg_strom_tpu.config import override
from pg_strom_tpu.errors import SqlError


@pytest.fixture(scope="module")
def db():
    db = Database()
    db.create(Table.from_columns("a", {
        "k": column_from_values(T.INT4, [1, 2, 3, 4, None]),
        "v": column_from_values(T.TEXT, ["one", "two", "three", "four", "nul"]),
    }))
    db.create(Table.from_columns("b", {
        "k": column_from_values(T.INT4, [2, 3, 3, 5]),
        "w": column_from_values(T.FLOAT8, [2.0, 3.0, 3.5, 5.0]),
    }))
    rng = np.random.default_rng(42)
    n = 3000
    db.create(Table.from_columns("big", {
        "id": column_from_values(T.INT4, list(range(n))),
        "k": column_from_values(T.INT4, list(rng.integers(0, 40, n))),
        "x": column_from_values(T.FLOAT4, list(rng.random(n).astype(float))),
    }))
    db.create(Table.from_columns("dim", {
        "k": column_from_values(T.INT4, list(range(0, 50, 2))),  # evens only
        "nm": column_from_values(T.TEXT, [f"d{i}" for i in range(0, 50, 2)]),
    }))
    return db


class TestOuterJoins:
    def test_left_basic(self, db):
        r = execute("select a.k, b.w from a left join b on a.k = b.k "
                    "order by a.k nulls last, b.w", db).rows
        assert r == [(1, None), (2, 2.0), (3, 3.0), (3, 3.5), (4, None),
                     (None, None)]

    def test_right_basic(self, db):
        r = execute("select a.k, b.k, b.w from a right join b on a.k = b.k "
                    "order by b.k, b.w", db).rows
        assert r == [(2, 2, 2.0), (3, 3, 3.0), (3, 3, 3.5), (None, 5, 5.0)]

    def test_full_basic(self, db):
        r = execute("select a.k, b.k from a full join b on a.k = b.k", db).rows
        assert len(r) == 7
        assert (1, None) in r and (None, 5) in r and (None, None) in r
        assert r.count((3, 3)) == 2

    def test_left_outer_keyword(self, db):
        r = execute("select count(*) from a left outer join b on a.k = b.k",
                    db).rows
        assert r == [(6,)]

    def test_residual_on_qual(self, db):
        # probe-side ON qual gates MATCHING, not probe survival
        r = execute("select a.k, b.w from a left join b on a.k = b.k "
                    "and a.k >= 3 order by a.k nulls last, b.w", db).rows
        assert r == [(1, None), (2, None), (3, 3.0), (3, 3.5), (4, None),
                     (None, None)]

    def test_where_after_outer(self, db):
        # anti-join pattern: WHERE applies to the NULL-extended result
        r = execute("select a.k from a left join b on a.k = b.k "
                    "where b.w is null order by a.k nulls last", db).rows
        assert r == [(1,), (4,), (None,)]

    def test_left_then_aggregate(self, db):
        r = execute("select count(*), count(b.w), sum(b.w) "
                    "from a left join b on a.k = b.k", db).rows
        assert r == [(6, 3, 8.5)]

    def test_left_big_device_path(self, db):
        # the probe/inner machinery runs on the device tier; NULL extension
        # must agree with a host-computed reference
        with override(chunk_rows=1024):
            r = execute("select count(*), count(dim.nm) from big "
                        "left join dim on big.k = dim.k", db).rows
        with override(enabled=False):
            r2 = execute("select count(*), count(dim.nm) from big "
                         "left join dim on big.k = dim.k", db).rows
        assert r == r2
        assert r[0][0] == 3000          # every probe row preserved
        assert 0 < r[0][1] < 3000       # odds unmatched

    def test_outer_requires_equi(self, db):
        with pytest.raises(SqlError):
            execute("select * from a left join b on a.k < b.k", db)


class TestDistinct:
    def test_select_distinct(self, db):
        r = execute("select distinct k from b order by k", db).rows
        assert r == [(2,), (3,), (5,)]

    def test_distinct_multi_col(self, db):
        r = execute("select distinct k, k + 1 from b order by k", db).rows
        assert r == [(2, 3), (3, 4), (5, 6)]

    def test_distinct_with_limit(self, db):
        r = execute("select distinct k from b order by k limit 2", db).rows
        assert r == [(2,), (3,)]

    def test_count_distinct(self, db):
        r = execute("select count(distinct k), count(k) from b", db).rows
        assert r == [(3, 4)]

    def test_sum_avg_distinct_grouped(self, db):
        r = execute("select k, sum(distinct w) from b group by k order by k",
                    db).rows
        assert r == [(2, 2.0), (3, 6.5), (5, 5.0)]


class TestUnion:
    def test_union_dedupes(self, db):
        r = execute("select k from a where k is not null "
                    "union select k from b order by k", db).rows
        assert r == [(1,), (2,), (3,), (4,), (5,)]

    def test_union_all(self, db):
        r = execute("select k from b union all select k from b "
                    "order by k limit 3", db).rows
        assert r == [(2,), (2,), (3,)]

    def test_union_column_count_mismatch(self, db):
        with pytest.raises(SqlError):
            execute("select k, w from b union select k from b", db)

    def test_union_order_desc_nulls(self, db):
        r = execute("select k from a union select k from b "
                    "order by k desc", db).rows
        assert r == [(None,), (5,), (4,), (3,), (2,), (1,)]

    def test_union_in_subquery(self, db):
        r = execute("select count(*) from (select k from a union all "
                    "select k from b) u", db).rows
        assert r == [(9,)]


class TestExceptIntersect:
    """EXCEPT / INTERSECT [ALL] — PostgreSQL setop semantics: NULLs
    compare equal, EXCEPT ALL keeps countL-countR copies, INTERSECT ALL
    min(countL, countR); INTERSECT binds tighter than UNION/EXCEPT."""

    def test_except_dedupes_and_keeps_null(self, db):
        # a.k = {1,2,3,4,NULL}, b.k = {2,3,3,5}
        r = execute("select k from a except select k from b "
                    "order by k", db).rows
        assert r == [(1,), (4,), (None,)]

    def test_except_all_counts(self, db):
        # left [2,3,3,5] minus one 2, one 3 from a -> [3,5]
        r = execute("select k from b except all select k from a "
                    "order by k", db).rows
        assert r == [(3,), (5,)]

    def test_intersect(self, db):
        r = execute("select k from a intersect select k from b "
                    "order by k", db).rows
        assert r == [(2,), (3,)]

    def test_intersect_all_keeps_duplicates(self, db):
        r = execute("select k from b intersect all select k from b "
                    "order by k", db).rows
        assert r == [(2,), (3,), (3,), (5,)]

    def test_intersect_null_equality(self, db):
        r = execute("select k from a intersect "
                    "select k from a where k is null", db).rows
        assert r == [(None,)]

    def test_intersect_binds_tighter_than_union(self, db):
        # 1 UNION (2 INTERSECT 2) = {1,2}; wrong precedence would give {2}
        r = execute("select 1 union select 2 intersect select 2 "
                    "order by 1", db).rows
        assert r == [(1,), (2,)]

    def test_except_everything_is_empty(self, db):
        r = execute("select k from b except select k from b", db).rows
        assert r == []

    def test_setop_type_mismatch(self, db):
        with pytest.raises(SqlError):
            execute("select k from b except select w from b", db)

    def test_setop_in_subquery(self, db):
        r = execute("select count(*) from (select k from a intersect "
                    "select k from b) u", db).rows
        assert r == [(2,)]


class TestUpdateDelete:
    """UPDATE / DELETE — the WHERE match set rides the same ScanExecutor
    filter kernel as SELECT; SET expressions evaluate against the OLD
    row (PG semantics)."""

    @pytest.fixture()
    def ddb(self):
        d = Database()
        d.create(Table.from_columns("t", {
            "k": column_from_values(T.INT4, [1, 2, 3, 4, None]),
            "v": column_from_values(T.TEXT, ["a", "b", "c", "d", "e"]),
            "x": column_from_values(T.FLOAT8, [1.0, 2.0, 3.0, 4.0, 5.0]),
        }))
        return d

    def test_update_where(self, ddb):
        r = execute("update t set x = x * 10, v = upper(v) where k > 2",
                    ddb)
        assert r.command == "UPDATE 2"
        rows = execute("select k, v, x from t order by k nulls last",
                       ddb).rows
        assert rows == [(1, "a", 1.0), (2, "b", 2.0), (3, "C", 30.0),
                        (4, "D", 40.0), (None, "e", 5.0)]

    def test_delete_where(self, ddb):
        r = execute("delete from t where k is null or x >= 4", ddb)
        assert r.command == "DELETE 2"
        assert execute("select k from t order by k", ddb).rows == \
            [(1,), (2,), (3,)]

    def test_update_all_and_delete_all(self, ddb):
        assert execute("update t set k = k + 100", ddb).command == \
            "UPDATE 5"
        assert execute("select count(k) from t", ddb).rows == [(4,)]
        assert execute("delete from t", ddb).command == "DELETE 5"
        assert execute("select count(*) from t", ddb).rows == [(0,)]

    def test_set_sees_old_row(self, ddb):
        execute("create table sw (a int, b int)", ddb)
        execute("insert into sw values (1, 2)", ddb)
        execute("update sw set a = b, b = a", ddb)
        assert execute("select a, b from sw", ddb).rows == [(2, 1)]

    def test_update_unknown_column(self, ddb):
        with pytest.raises(SqlError):
            execute("update t set zz = 1", ddb)

    def test_update_overflow_raises(self, ddb):
        execute("create table ov (i smallint)", ddb)
        execute("insert into ov values (32767)", ddb)
        with pytest.raises(SqlError):
            execute("update ov set i = i + 1", ddb)

    def test_update_then_query_device(self, ddb):
        execute("update t set x = 100.0 where k in (1, 2)", ddb)
        r = execute("select sum(x) from t where x = 100.0", ddb).rows
        assert r == [(200.0,)]


class TestScalarFunctions:
    """Host-tier scalar functions (varlena/text manipulation stays on the
    CPU in the reference too); semantics match PostgreSQL."""

    def test_text_case_and_trim(self, db):
        r = execute("select upper('aBc'), lower('aBc'), trim('  x  '), "
                    "ltrim('  x  '), rtrim('  x  '), btrim('xxaxx', 'x')",
                    db).rows
        assert r == [("ABC", "abc", "x", "x  ", "  x", "a")]

    def test_substr_clamping(self, db):
        r = execute("select substr('abcdef', 2, 3), substr('abcdef', 0, 2), "
                    "substr('abcdef', 3), substring('abcdef', 5, 99)",
                    db).rows
        assert r == [("bcd", "a", "cdef", "ef")]

    def test_substr_negative_length_errors(self, db):
        with pytest.raises(SqlError):
            execute("select substr('abc', 1, -1)", db)

    def test_strpos_replace_repeat(self, db):
        r = execute("select strpos('abcdef', 'cd'), strpos('ab', 'zz'), "
                    "replace('aXbXc', 'X', '-'), repeat('ab', 3)", db).rows
        assert r == [(3, 0, "a-b-c", "ababab")]

    def test_left_right_negative_counts(self, db):
        # LEFT/RIGHT parse as functions despite being join keywords
        r = execute("select left('abcde', 2), left('abcde', -2), "
                    "right('abcde', 2), right('abcde', -2), "
                    "right('abcde', 0)", db).rows
        assert r == [("ab", "abc", "de", "cde", "")]

    def test_math_functions(self, db):
        r = execute("select exp(0.0::float8), ln(1.0::float8), "
                    "power(2.0::float8, 10.0::float8), "
                    "sign(-2.5::float8), log10(100.0::float8), "
                    "mod(7, 3), mod(-7, 3)", db).rows
        assert r == [(1.0, 0.0, 1024.0, -1.0, 2.0, 1, -1)]

    def test_ln_domain_errors(self, db):
        with pytest.raises(SqlError):
            execute("select ln(0.0::float8)", db)
        with pytest.raises(SqlError):
            execute("select ln(-1.0::float8)", db)

    def test_numeric_sign(self, db):
        from decimal import Decimal
        r = execute("select sign(0.0::numeric), sign('-4.2'::numeric)",
                    db).rows
        assert r == [(Decimal("0"), Decimal("-1"))]

    def test_strict_null_propagation(self, db):
        r = execute("select upper(case when k is null then null else v "
                    "end) from a where k is null", db).rows
        assert r == [(None,)]

    def test_functions_over_table_rows(self, db):
        r = execute("select k, upper(v), length(v) from a "
                    "where k is not null order by k", db).rows
        assert r == [(1, "ONE", 3), (2, "TWO", 3), (3, "THREE", 5),
                     (4, "FOUR", 4)]


class TestCtes:
    """WITH (non-recursive CTEs), desugared into FROM-subqueries by
    plan/planner._expand_ctes — PostgreSQL >= 12 inlining semantics."""

    def test_basic(self, db):
        r = execute("with t as (select k from a where k > 1) "
                    "select count(*) from t", db).rows
        assert r == [(3,)]

    def test_column_aliases(self, db):
        r = execute("with t(x) as (select k from b) "
                    "select x from t order by x", db).rows
        assert r == [(2,), (3,), (3,), (5,)]

    def test_chained_ctes(self, db):
        r = execute("with t as (select k from a), "
                    "u as (select k from t where k > 2) "
                    "select count(*) from u", db).rows
        assert r == [(2,)]

    def test_cte_in_join(self, db):
        r = execute("with t as (select k from a where k is not null) "
                    "select t.k, count(*) from t join b on t.k = b.k "
                    "group by t.k order by t.k", db).rows
        assert r == [(2, 1), (3, 2)]

    def test_cte_shadows_table(self, db):
        # a CTE named like a real table wins (PG scoping)
        r = execute("with b as (select 42 k) select k from b", db).rows
        assert r == [(42,)]

    def test_cte_referenced_twice(self, db):
        r = execute("with t as (select k from b) "
                    "select k from t union all select k from t "
                    "order by k limit 3", db).rows
        assert r == [(2,), (2,), (3,)]

    def test_cte_in_where_subquery(self, db):
        r = execute("with t as (select k from b) select count(*) from a "
                    "where a.k in (select k from t)", db).rows
        assert r == [(2,)]

    def test_cte_under_setop(self, db):
        r = execute("with t as (select k from b) "
                    "select k from t except select 3 order by k", db).rows
        assert r == [(2,), (5,)]

    def test_recursive_non_self_referencing_inlines(self, db):
        # WITH RECURSIVE whose body never references itself is an
        # ordinary CTE (PG accepts it too)
        r = execute("with recursive t as (select 1 x) select x from t",
                    db).rows
        assert r == [(1,)]

    def test_self_reference_is_unknown_relation(self, db):
        with pytest.raises(KeyError):
            execute("with t as (select k from t) select * from t", db)

    def test_subquery_column_alias_width_check(self, db):
        with pytest.raises(SqlError):
            execute("select x from (select k from b) s(x, y)", db)


class TestSubqueries:
    def test_in_subquery(self, db):
        r = execute("select k from b where k in (select k from a) "
                    "order by k", db).rows
        assert r == [(2,), (3,), (3,)]

    def test_not_in_subquery(self, db):
        r = execute("select distinct k from b where k not in "
                    "(select k from a where k is not null) order by k",
                    db).rows
        assert r == [(5,)]

    def test_scalar_subquery(self, db):
        r = execute("select k from b where w > (select avg(w) from b) "
                    "order by k", db).rows
        assert r == [(3,), (5,)]

    def test_scalar_subquery_in_select_list(self, db):
        r = execute("select k, (select max(w) from b) from a "
                    "where k = 1", db).rows
        assert r == [(1, 5.0)]

    def test_exists(self, db):
        r = execute("select exists (select 1 from b where k = 2), "
                    "exists (select 1 from b where k = 99)", db).rows
        assert r == [(True, False)]

    def test_empty_in_and_not_in(self, db):
        assert execute("select count(*) from a where k in "
                       "(select k from b where k > 90)", db).rows == [(0,)]
        assert execute("select count(*) from a where k not in "
                       "(select k from b where k > 90)", db).rows == [(5,)]

    def test_scalar_subquery_multirow_errors(self, db):
        from pg_strom_tpu.plan.binder import BindError
        with pytest.raises((SqlError, BindError)):
            execute("select (select k from b)", db)


class TestTopKPushdown:
    """ORDER BY ... LIMIT through the planner's device top-k path
    (plan/planner._topk_rows), including the prefix-tie overflow ->
    exact-rerun retry contract."""

    @pytest.fixture(scope="class")
    def tdb(self):
        rng = np.random.default_rng(7)
        n = 4096
        db = Database()
        db.create(Table.from_columns("t", {
            "id": column_from_values(T.INT4, list(range(n))),
            "x": column_from_values(
                T.FLOAT8, [float(v) for v in rng.standard_normal(n)]),
            "c": column_from_values(T.FLOAT8, [1.0] * n),   # all ties
        }))
        return db

    def test_threshold_topk(self, tdb):
        r = execute("select id, x from t order by x desc limit 10", tdb).rows
        xs = [row[1] for row in r]
        assert xs == sorted(xs, reverse=True) and len(r) == 10
        top = execute("select max(x) from t", tdb).rows[0][0]
        assert xs[0] == top

    def test_tie_overflow_exact_rerun(self, tdb):
        # constant sort key: every prefix ties -> device flags ovf, planner
        # re-runs the chunk with the exact full-sort variant; stability =
        # row order, so the first 5 ids win
        r = execute("select id from t order by c limit 5", tdb).rows
        assert r == [(0,), (1,), (2,), (3,), (4,)]

    def test_topk_with_where(self, tdb):
        r = execute("select id, x from t where id >= 4000 "
                    "order by x limit 3", tdb).rows
        assert len(r) == 3 and all(row[0] >= 4000 for row in r)
        xs = [row[1] for row in r]
        assert xs == sorted(xs)


class TestConditionalFunctions:
    """NULLIF / GREATEST / LEAST / IS [NOT] DISTINCT FROM — bound as
    CASE/NullTest desugarings (binder.py), so device and host tiers share
    one implementation; asserted device == host == hand-derived."""

    def _both(self, db, q):
        got = execute(q, db).rows
        with override(enabled=False):
            host = execute(q, db).rows
        assert got == host, f"device != host for {q}: {got} vs {host}"
        return got

    def test_nullif(self, db):
        assert self._both(db, "select nullif(k, 2) from a order by k") == \
            [(1,), (None,), (3,), (4,), (None,)]
        assert self._both(db, "select nullif(v, 'two') from a "
                              "where k = 2") == [(None,)]

    def test_greatest_least(self, db):
        # PG: greatest/least SKIP null inputs -> greatest(NULL, 3) = 3
        assert self._both(db, "select greatest(k, 3), least(k, 3) from a "
                              "order by k") == \
            [(3, 1), (3, 2), (3, 3), (4, 3), (3, 3)]
        # PG skips NULL inputs; result NULL only when all inputs are NULL
        assert self._both(db, "select greatest(k, null) from a "
                              "where k is null") == [(None,)]
        assert self._both(db, "select greatest(null, k, 2) from a "
                              "where k is null") == [(2,)]
        # mixed types promote (int + numeric literal)
        assert self._both(db, "select least(k, 1.5) from a where k = 1") == \
            [(execute("select 1.0 + 0.0", Database()).rows[0][0].__class__('1'),)]

    def test_is_distinct_from(self, db):
        assert self._both(db, "select count(*) from a "
                              "where k is distinct from 2") == [(4,)]
        assert self._both(db, "select count(*) from a "
                              "where k is not distinct from null") == [(1,)]
        assert self._both(db, "select count(*) from a "
                              "where v is not distinct from 'nul'") == [(1,)]
        assert self._both(db, "select count(*) from b "
                              "where w is distinct from 3.0") == [(3,)]
        assert self._both(db, "select count(*) from a "
                              "where null is distinct from null") == [(0,)]
