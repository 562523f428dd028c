"""Correlated subqueries (plan/correlated.py SubPlans) and WITH RECURSIVE
(plan/planner.plan_recursive worktable iteration).

The reference system leaves both node types to the PostgreSQL CPU
executor (grafter.c:24-149 swaps only scan/join/agg below them); this
engine owns the executor, so the same host tiers live here — with the
inner scans/joins/aggs of each instantiation still offloading.
Semantics asserted against hand-derived PostgreSQL results.
"""

import pytest

import pg_strom_tpu  # noqa: F401
from pg_strom_tpu import T, Table, column_from_values, override
from pg_strom_tpu.datastore import Database
from pg_strom_tpu.errors import SqlError
from pg_strom_tpu.sql import execute, explain


@pytest.fixture(scope="module")
def db():
    d = Database()
    d.create(Table.from_columns("emp", {
        "id": column_from_values(T.INT4, [1, 2, 3, 4, 5]),
        "dept": column_from_values(T.TEXT, ["a", "a", "b", "b", None]),
        "sal": column_from_values(T.INT4, [100, 200, 50, 300, 150]),
    }))
    d.create(Table.from_columns("dept", {
        "name": column_from_values(T.TEXT, ["a", "b"]),
        "budget": column_from_values(T.INT4, [1000, 100]),
    }))
    return d


class TestCorrelatedScalar:
    def test_scalar_lookup(self, db):
        r = execute("select id, (select budget from dept "
                    "where name = emp.dept) from emp order by id", db).rows
        assert r == [(1, 1000), (2, 1000), (3, 100), (4, 100), (5, None)]

    def test_scalar_aggregate_per_group(self, db):
        r = execute("select id from emp e where sal > (select avg(sal) "
                    "from emp e2 where e2.dept = e.dept) "
                    "order by id", db).rows
        assert r == [(2,), (4,)]

    def test_multi_row_scalar_errors(self, db):
        with pytest.raises(SqlError):
            execute("select (select sal from emp e2 where "
                    "e2.dept = e.dept) from emp e", db)

    def test_uncorrelated_initplan_still_runs_once(self, db):
        r = execute("select id from emp where sal > "
                    "(select avg(sal) from emp) order by id", db).rows
        assert r == [(2,), (4,)]

    def test_memoization_repeated_keys(self, db):
        # 2 distinct depts + NULL => at most 3 subplan executions; the
        # memo makes this observable only via correctness here
        r = execute("select count(*) from emp e where sal < (select "
                    "sum(sal) from emp e2 where e2.dept = e.dept)", db).rows
        assert r == [(4,)]

    def test_inner_name_shadows_outer(self, db):
        # bare `sal` inside resolves to e2 (innermost), not the outer row
        r = execute("select id from emp e where exists (select 1 from "
                    "emp e2 where sal > 250) order by id", db).rows
        assert r == [(1,), (2,), (3,), (4,), (5,)]


class TestCorrelatedExistsIn:
    def test_exists(self, db):
        r = execute("select id from emp e where exists (select 1 from "
                    "dept d where d.name = e.dept and d.budget > e.sal) "
                    "order by id", db).rows
        assert r == [(1,), (2,), (3,)]

    def test_not_exists(self, db):
        r = execute("select id from emp e where not exists (select 1 "
                    "from dept d where d.name = e.dept) order by id",
                    db).rows
        assert r == [(5,)]

    def test_correlated_in_three_valued(self):
        d = Database()
        d.create(Table.from_columns("t", {
            "a": column_from_values(T.INT4, [1, 2, None, 3]),
            "g": column_from_values(T.INT4, [1, 1, 2, 2]),
        }))
        r = execute("select a from t x where a in (select a from t y "
                    "where y.g = x.g) order by a", d).rows
        assert r == [(1,), (2,), (3,)]
        # NOT IN with a NULL in the set is never TRUE (PG 3VL)
        r = execute("select a from t x where a not in (select a from t y "
                    "where y.g = 2) order by a", d).rows
        assert r == []

    def test_select_list_exists(self, db):
        r = execute("select id, exists (select 1 from dept d where "
                    "d.name = e.dept) from emp e order by id", db).rows
        assert r == [(1, True), (2, True), (3, True), (4, True),
                     (5, False)]

    def test_device_host_agree(self, db):
        sql = ("select id, (select max(budget) from dept d where "
               "d.name = e.dept) from emp e where sal >= 100 order by id")
        outs = []
        for dev in (True, False):
            with override(enabled=dev):
                outs.append(execute(sql, db).rows)
        assert outs[0] == outs[1]

    def test_missing_relation_still_errors_at_bind(self, db):
        with pytest.raises(KeyError):
            execute("select id from emp e where exists (select 1 from "
                    "nosuch where x = e.id)", db)


class TestWithRecursive:
    def test_series_sum(self, db):
        r = execute("with recursive s(n) as (select 1 union all "
                    "select n+1 from s where n < 100) "
                    "select sum(n), count(*) from s", db).rows
        assert r == [(5050, 100)]

    def test_cycle_terminates_with_union_distinct(self):
        d = Database()
        d.create(Table.from_columns("edges", {
            "src": column_from_values(T.INT4, [1, 2, 3, 3]),
            "dst": column_from_values(T.INT4, [2, 3, 1, 4]),
        }))
        r = execute("with recursive reach(n) as (select 2 union "
                    "select e.dst from edges e join reach r on "
                    "e.src = r.n) select n from reach order by n", d).rows
        assert r == [(1,), (2,), (3,), (4,)]

    def test_multi_column_state(self, db):
        r = execute("with recursive f(a, b) as (select 1, 1 union all "
                    "select b, a+b from f where b < 50) "
                    "select a from f order by a", db).rows
        assert [v for (v,) in r] == [1, 1, 2, 3, 5, 8, 13, 21, 34]

    def test_self_ref_in_base_term_rejected(self, db):
        with pytest.raises(SqlError):
            execute("with recursive s(n) as (select n from s union all "
                    "select 1) select * from s", db)

    def test_depth_limit(self, db):
        with pytest.raises(SqlError):
            execute("with recursive s(n) as (select 1 union all "
                    "select n+1 from s) select count(*) from s", db)

    def test_explain_recursive_union(self, db):
        txt = explain("with recursive s(n) as (select 1 union all "
                      "select n+1 from s where n < 3) select * from s", db)
        assert "RecursiveUnion" in txt

    def test_recursive_over_base_table(self, db):
        # org-chart-ish walk over a real scanned table
        d = Database()
        d.create(Table.from_columns("tree", {
            "id": column_from_values(T.INT4, [1, 2, 3, 4, 5]),
            "parent": column_from_values(T.INT4, [None, 1, 1, 2, 4]),
        }))
        r = execute("with recursive sub(id) as (select 2 union all "
                    "select t.id from tree t join sub s on "
                    "t.parent = s.id) select id from sub order by id",
                    d).rows
        assert r == [(2,), (4,), (5,)]


class TestCorrelatedInDml:
    """Correlated subqueries compose with the plane-level DML tier."""

    @pytest.fixture()
    def dmldb(self):
        d = Database()
        d.create(Table.from_columns("emp", {
            "id": column_from_values(T.INT4, [1, 2, 3]),
            "dept": column_from_values(T.TEXT, ["a", "a", "b"]),
            "sal": column_from_values(T.INT4, [100, 200, 50]),
        }))
        d.create(Table.from_columns("lim", {
            "name": column_from_values(T.TEXT, ["a", "b"]),
            "cap": column_from_values(T.INT4, [150, 80]),
        }))
        return d

    def test_update_where_correlated(self, dmldb):
        execute("UPDATE emp SET sal = 0 WHERE sal > (select cap from lim "
                "where name = emp.dept)", dmldb)
        assert execute("select id, sal from emp order by id", dmldb).rows \
            == [(1, 100), (2, 0), (3, 50)]

    def test_update_set_correlated_scalar(self, dmldb):
        execute("UPDATE emp SET sal = (select cap from lim where "
                "name = emp.dept)", dmldb)
        assert execute("select id, sal from emp order by id", dmldb).rows \
            == [(1, 150), (2, 150), (3, 80)]

    def test_delete_where_correlated_exists(self, dmldb):
        execute("DELETE FROM emp WHERE exists (select 1 from lim where "
                "name = emp.dept and cap < 100)", dmldb)
        assert execute("select id from emp order by id", dmldb).rows \
            == [(1,), (2,)]


class TestCorrelatedScoping:
    def test_join_on_names_resolve_inner_first(self):
        # an ON condition's bare column names belong to the subquery's
        # own relations even when the outer row has same-named columns
        # (round-5 self-review: ON clauses briefly scoped like FROM)
        d = Database()
        d.create(Table.from_columns("outer_t", {
            "k": column_from_values(T.INT4, [1, 99]),
            "tag": column_from_values(T.INT4, [1, 2]),
        }))
        d.create(Table.from_columns("a", {
            "k": column_from_values(T.INT4, [1, 2]),
            "v": column_from_values(T.INT4, [10, 20]),
        }))
        d.create(Table.from_columns("b", {
            "j": column_from_values(T.INT4, [1, 3]),
        }))
        # `k = j` inside ON: k is a.k (inner), never outer_t.k; the
        # correlation is only tag = outer_t.tag
        r = execute("select k from outer_t o where exists ("
                    "select 1 from a join b on k = j "
                    "where a.v = 10 and o.tag = 1) order by k", d).rows
        assert r == [(1,)]          # only the tag=1 outer row qualifies
        r = execute("select k from outer_t o where exists ("
                    "select 1 from a join b on k = j "
                    "where a.v = 10 and o.tag = 2) order by k", d).rows
        assert r == [(99,)]
        # had ON's k resolved to outer_t.k, the tag=2 probe would find
        # no a-row with k = 99 and return []


class TestReviewFindings:
    """Distilled repros from the round-5 code review."""

    def test_correlated_on_grouped_column(self, db):
        # outer_args referencing grouped columns substitute to Params in
        # the final projection (replace_subtrees now descends SubPlan)
        r = execute("select dept, (select budget from dept d where "
                    "d.name = emp.dept) from emp group by dept "
                    "order by dept nulls last", db).rows
        assert r == [("a", 1000), ("b", 100), (None, None)]

    def test_correlated_exists_in_having(self, db):
        r = execute("select dept from emp group by dept having exists "
                    "(select 1 from dept d where d.name = emp.dept) "
                    "order by dept", db).rows
        assert r == [("a",), ("b",)]

    def test_recursive_type_mismatch_plan_time(self, db):
        with pytest.raises(SqlError, match="has type"):
            execute("with recursive s(n) as (select 1 union all "
                    "select n+0.5 from s where n < 3) select * from s", db)

    def test_recursive_arity_mismatch_with_empty_base(self, db):
        with pytest.raises(SqlError, match="same number of columns"):
            execute("with recursive s(n) as (select id from emp where "
                    "id > 100 union all select n+1, n from s where n < 3) "
                    "select * from s", db)

    def test_recursive_narrowing_coercion_accepted(self, db):
        # int8 base accepts an int4-typed recursive term (coerces up)
        r = execute("with recursive s(n) as (select count(*) from emp "
                    "union all select 1 from s where n > 3) "
                    "select count(*) from s", db).rows
        assert r == [(2,)]      # base row (5), one rec row (1), stop
