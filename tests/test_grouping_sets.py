"""GROUP BY ROLLUP / CUBE / GROUPING SETS (plan_grouping_sets).

Desugared into one grouped subplan per set (each on the device pipeline)
with rows appended — PG's MixedAggregate.  Semantics asserted against
hand-derived PostgreSQL results, including GROUPING() bitmasks, HAVING
over rolled-up groups, and the element cross-product (GROUP BY a,
ROLLUP(b)).  The reference leaves grouping sets to the PostgreSQL CPU
executor; here each per-set aggregation still offloads.
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
    d.create(Table.from_columns("s", {
        "a": column_from_values(T.TEXT, ["x", "x", "y", "y", "y"]),
        "b": column_from_values(T.INT4, [1, 2, 1, 1, 2]),
        "v": column_from_values(T.INT4, [10, 20, 30, 40, 50]),
    }))
    return d


class TestRollup:
    def test_rollup_two_keys(self, db):
        r = execute("select a, b, sum(v) from s group by rollup (a, b) "
                    "order by 1 nulls last, 2 nulls last", db).rows
        assert r == [("x", 1, 10), ("x", 2, 20), ("x", None, 30),
                     ("y", 1, 70), ("y", 2, 50), ("y", None, 120),
                     (None, None, 150)]

    def test_mixed_plain_and_rollup(self, db):
        # GROUP BY a, ROLLUP(b) = sets (a,b), (a)
        r = execute("select a, b, sum(v) from s group by a, rollup (b) "
                    "order by 1, 2 nulls last", db).rows
        assert r == [("x", 1, 10), ("x", 2, 20), ("x", None, 30),
                     ("y", 1, 70), ("y", 2, 50), ("y", None, 120)]

    def test_having_applies_to_rolled_groups(self, db):
        r = execute("select a, sum(v) from s group by rollup (a) "
                    "having sum(v) > 100 order by 1 nulls last", db).rows
        assert r == [("y", 120), (None, 150)]


class TestCube:
    def test_cube_two_keys_shape(self, db):
        r = execute("select a, b, count(*) from s group by cube (a, b)",
                    db).rows
        # 2 a-values x 2 b-values + 2 a-subtotals + 2 b-subtotals + total
        assert len(r) == 4 + 2 + 2 + 1
        assert (None, None, 5) in r
        assert ("x", None, 2) in r and (None, 1, 3) in r


class TestGroupingSets:
    def test_explicit_sets(self, db):
        r = execute("select a, b, sum(v) from s group by grouping sets "
                    "((a), (b), ()) order by 1 nulls last, 2 nulls last",
                    db).rows
        assert r == [("x", None, 30), ("y", None, 120), (None, 1, 80),
                     (None, 2, 70), (None, None, 150)]

    def test_grouping_bitmask(self, db):
        r = execute("select a, b, grouping(a, b), count(*) from s "
                    "group by rollup (a, b) order by 3, 1 nulls last, "
                    "2 nulls last", db).rows
        assert [g for (_, _, g, _) in r] == [0, 0, 0, 0, 1, 1, 3]
        assert r[-1] == (None, None, 3, 5)

    def test_grouping_arg_must_be_grouped(self, db):
        with pytest.raises(SqlError):
            execute("select grouping(v) from s group by rollup (a)", db)

    def test_explain_mixed_aggregate(self, db):
        txt = explain("select a, sum(v) from s group by rollup (a)", db)
        assert "MixedAggregate" in txt

    def test_device_host_agree(self, db):
        sql = ("select a, b, grouping(a, b), sum(v), count(*) from s "
               "group by cube (a, b) order by 3, 1 nulls last, "
               "2 nulls last")
        outs = []
        for dev in (True, False):
            with override(enabled=dev):
                outs.append(execute(sql, db).rows)
        assert outs[0] == outs[1]

    def test_distinct_over_sets(self, db):
        # (a) and rollup-dup sets: DISTINCT dedupes identical rows
        r = execute("select distinct count(*) from s group by "
                    "grouping sets ((), ())", db).rows
        assert r == [(5,)]

    def test_empty_set_no_aggregates_one_row(self, db):
        # PG: the () set still makes exactly one group even with no
        # aggregate in the select list (round-4 advisor: this planned as
        # a plain projection, one row per input row).
        r = execute("select a from s group by rollup (a) "
                    "order by a nulls last", db).rows
        assert r == [("x",), ("y",), (None,)]
        r = execute("select a, grouping(a) from s group by "
                    "grouping sets ((a), ()) order by a nulls last", db).rows
        assert r == [("x", 0), ("y", 0), (None, 1)]

    def test_empty_set_no_aggregates_empty_table(self):
        # GROUP BY () yields one row even over an empty input (PG).
        d = Database()
        d.create(Table.from_columns("e", {
            "a": column_from_values(T.INT4, []),
        }))
        assert execute("select a from e group by rollup (a)", d).rows \
            == [(None,)]

    def test_empty_set_having_aggregate(self, db):
        # HAVING carries the only aggregate: the subplan must still
        # aggregate to one row and apply the filter over it.
        r = execute("select a from s group by rollup (a) "
                    "having count(*) > 1 order by a nulls last", db).rows
        assert r == [("x",), ("y",), (None,)]
        r = execute("select a from s group by rollup (a) "
                    "having count(*) > 4 order by a nulls last", db).rows
        assert r == [(None,)]


class TestSinglePassRollup:
    """Round 5: plain single-table grouping sets aggregate in ONE
    finest-grain device pass with host state rollup; joins/subqueries
    keep the per-set subplan path.  Both must agree."""

    def test_explain_shows_single_pass(self, db):
        txt = explain("select a, sum(v) from s group by rollup (a)", db)
        assert "single-pass rollup" in txt
        assert txt.count("TpuPreAgg") == 1

    def test_subquery_shape_keeps_per_set_path(self, db):
        txt = explain("select a, sum(v) from (select * from s) q "
                      "group by rollup (a)", db)
        assert "single-pass" not in txt

    def test_paths_agree(self, db):
        q1 = ("select a, b, grouping(a, b), sum(v), count(*), min(v), "
              "avg(v) from s group by cube (a, b) "
              "order by 3, 1 nulls last, 2 nulls last")
        # same query via a pass-through subquery forces the per-set path
        q2 = q1.replace("from s ", "from (select * from s) s ")
        assert execute(q1, db).rows == execute(q2, db).rows

    def test_paths_agree_empty_set_no_aggs(self, db):
        q1 = "select a from s group by rollup (a) order by a nulls last"
        q2 = q1.replace("from s ", "from (select * from s) s ")
        assert execute(q1, db).rows == execute(q2, db).rows

    def test_having_over_rollup_single_pass(self, db):
        r = execute("select a, sum(v) from s group by rollup (a) "
                    "having sum(v) > 100 order by a nulls last", db).rows
        assert r == [("y", 120), (None, 150)]

    def test_distinct_agg_keeps_per_set_path(self, db):
        txt = explain("select a, count(distinct b) from s "
                      "group by rollup (a)", db)
        assert "single-pass" not in txt
        r = execute("select a, count(distinct b) from s group by "
                    "rollup (a) order by a nulls last", db).rows
        assert r == [("x", 2), ("y", 2), (None, 2)]
