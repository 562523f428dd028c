"""Window functions: plan/window.py WindowAgg tier.

Semantics asserted against hand-derived PostgreSQL results (the reference
leaves window functions to the PostgreSQL CPU executor; this engine's
WindowAgg is the same CPU tier layered over the device pipeline).
Covers: rankers, running aggregates with peer-group (RANGE) default
frames, lag/lead with offsets and per-row defaults, first/last_value,
windows over GROUP BY outputs, windows in ORDER BY, DISTINCT-after-
window ordering, and the rejection surface.
"""

import pytest

import pg_strom_tpu  # noqa: F401
from pg_strom_tpu import T, Table, column_from_values, override
from pg_strom_tpu.datastore import Database
from pg_strom_tpu.errors import SqlError
from pg_strom_tpu.sql import execute, explain
from pg_strom_tpu.sql.parser import ParseError


from pg_strom_tpu.plan import window as winmod


from pg_strom_tpu.config import config as _cfg


@pytest.fixture(params=["columnar", "rowfast", "rowslow"], autouse=True)
def _both_paths(request, monkeypatch):
    """Every assertion runs through all three window tiers (round-5: the
    plane-space and row-numpy tiers must be indistinguishable from the
    exact per-row path)."""
    if request.param == "columnar":
        monkeypatch.setattr(_cfg, "vectorized_windows", True)
        monkeypatch.setattr(winmod, "_FAST_MIN_ROWS", 0)
    elif request.param == "rowfast":
        monkeypatch.setattr(_cfg, "vectorized_windows", False)
        monkeypatch.setattr(winmod, "_FAST_MIN_ROWS", 0)
    else:
        monkeypatch.setattr(_cfg, "vectorized_windows", False)
        monkeypatch.setattr(winmod, "_FAST_MIN_ROWS", 1 << 30)


@pytest.fixture(scope="module")
def db():
    d = Database()
    d.create(Table.from_columns("emp", {
        "dept": column_from_values(T.TEXT, ["a", "a", "a", "b", "b", None]),
        "sal": column_from_values(T.INT4, [100, 200, 200, 50, 70, 10]),
        "id": column_from_values(T.INT4, [1, 2, 3, 4, 5, 6]),
    }))
    return d


class TestRankers:
    def test_row_number(self, db):
        r = execute("select id, row_number() over (order by sal desc, id) "
                    "from emp order by id", db).rows
        assert r == [(1, 3), (2, 1), (3, 2), (4, 5), (5, 4), (6, 6)]

    def test_rank_with_partition_and_ties(self, db):
        r = execute("select id, rank() over (partition by dept "
                    "order by sal) from emp order by id", db).rows
        assert r == [(1, 1), (2, 2), (3, 2), (4, 1), (5, 2), (6, 1)]

    def test_rank_skips_after_ties(self, db):
        r = execute("select id, rank() over (order by sal) from emp "
                    "order by id", db).rows
        assert r == [(1, 4), (2, 5), (3, 5), (4, 2), (5, 3), (6, 1)]

    def test_dense_rank(self, db):
        r = execute("select id, dense_rank() over (order by sal) from emp "
                    "order by id", db).rows
        assert r == [(1, 4), (2, 5), (3, 5), (4, 2), (5, 3), (6, 1)]

    def test_row_number_no_order(self, db):
        r = execute("select row_number() over () from emp", db).rows
        assert sorted(v for (v,) in r) == [1, 2, 3, 4, 5, 6]


class TestAggregateWindows:
    def test_running_sum_per_partition(self, db):
        r = execute("select id, sum(sal) over (partition by dept "
                    "order by sal, id) from emp order by id", db).rows
        assert r == [(1, 100), (2, 300), (3, 500), (4, 50), (5, 120),
                     (6, 10)]

    def test_whole_partition_sum(self, db):
        r = execute("select id, sum(sal) over (partition by dept) "
                    "from emp order by id", db).rows
        assert r == [(1, 500), (2, 500), (3, 500), (4, 120), (5, 120),
                     (6, 10)]

    def test_peers_share_running_value(self, db):
        # RANGE default frame: tied rows (sal=200) both see the full 630
        r = execute("select id, sum(sal) over (order by sal) from emp "
                    "order by id", db).rows
        assert r == [(1, 230), (2, 630), (3, 630), (4, 60), (5, 130),
                     (6, 10)]

    def test_avg_returns_numeric(self, db):
        from decimal import Decimal
        r = execute("select id, avg(sal) over (partition by dept) "
                    "from emp where dept = 'b' order by id", db).rows
        assert r == [(4, Decimal("60.0000000000000000")),
                     (5, Decimal("60.0000000000000000"))]

    def test_count_star_over_empty_spec(self, db):
        r = execute("select count(*) over (), id from emp "
                    "order by id limit 2", db).rows
        assert r == [(6, 1), (6, 2)]

    def test_min_max_over(self, db):
        r = execute("select id, min(sal) over (order by id), "
                    "max(sal) over (order by id) from emp "
                    "order by id", db).rows
        assert r == [(1, 100, 100), (2, 100, 200), (3, 100, 200),
                     (4, 50, 200), (5, 50, 200), (6, 10, 200)]

    def test_window_over_grouped_query(self, db):
        from decimal import Decimal
        r = execute("select dept, count(*) c, sum(sum(sal)) over "
                    "(order by dept nulls last) from emp group by dept "
                    "order by dept nulls last", db).rows
        assert r == [("a", 3, Decimal("500")), ("b", 2, Decimal("620")),
                     (None, 1, Decimal("630"))]

    def test_expression_around_window(self, db):
        from decimal import Decimal
        r = execute("select id, sal - avg(sal) over (partition by dept) d "
                    "from emp where dept = 'b' order by id", db).rows
        assert r == [(4, Decimal("-10.0000000000000000")),
                     (5, Decimal("10.0000000000000000"))]


class TestOffsets:
    def test_lag_default_null(self, db):
        r = execute("select id, lag(sal) over (order by id) from emp "
                    "order by id", db).rows
        assert r == [(1, None), (2, 100), (3, 200), (4, 200), (5, 50),
                     (6, 70)]

    def test_lead_with_offset_and_default(self, db):
        r = execute("select id, lead(sal, 2, -1) over (order by id) "
                    "from emp order by id", db).rows
        assert r == [(1, 200), (2, 50), (3, 70), (4, 10), (5, -1),
                     (6, -1)]

    def test_lag_respects_partitions(self, db):
        r = execute("select id, lag(sal) over (partition by dept "
                    "order by id) from emp order by id", db).rows
        assert r == [(1, None), (2, 100), (3, 200), (4, None), (5, 50),
                     (6, None)]

    def test_first_value_desc(self, db):
        r = execute("select id, first_value(sal) over (partition by dept "
                    "order by sal desc) from emp order by id", db).rows
        assert r == [(1, 200), (2, 200), (3, 200), (4, 70), (5, 70),
                     (6, 10)]

    def test_last_value_default_frame_gotcha(self, db):
        # default frame ends at the current row's last PEER, not the
        # partition end — the classic PG last_value behavior
        r = execute("select id, last_value(sal) over (order by sal) "
                    "from emp order by id", db).rows
        assert r == [(1, 100), (2, 200), (3, 200), (4, 50), (5, 70),
                     (6, 10)]


class TestWindowPlacement:
    def test_window_in_order_by(self, db):
        r = execute("select id from emp order by row_number() over "
                    "(order by sal desc, id) limit 2", db).rows
        assert r == [(2,), (3,)]

    def test_distinct_after_window(self, db):
        r = execute("select distinct dept, rank() over (partition by dept "
                    "order by sal) from emp where dept = 'a'", db).rows
        assert sorted(r) == [("a", 1), ("a", 2)]

    def test_two_windows_one_query(self, db):
        r = execute("select id, row_number() over (order by sal, id) rn, "
                    "sum(sal) over (partition by dept) s from emp "
                    "order by id limit 2", db).rows
        assert r == [(1, 4, 500), (2, 5, 500)]

    def test_explain_shows_windowagg(self, db):
        txt = explain("select rank() over (order by sal) from emp", db)
        assert "WindowAgg" in txt

    def test_device_host_agree(self, db):
        sql = ("select id, rank() over (partition by dept order by sal), "
               "sum(sal) over (order by id) from emp order by id")
        outs = []
        for dev in (True, False):
            with override(enabled=dev):
                outs.append(execute(sql, db).rows)
        assert outs[0] == outs[1]


class TestRejections:
    def test_frame_clause_rejected(self, db):
        with pytest.raises(ParseError):
            execute("select sum(sal) over (order by id rows between "
                    "1 preceding and current row) from emp", db)

    def test_window_in_where_rejected(self, db):
        with pytest.raises(SqlError):
            execute("select id from emp where rank() over (order by sal) "
                    "< 3", db)

    def test_nested_window_rejected(self, db):
        with pytest.raises(SqlError):
            execute("select sum(rank() over (order by id)) over () "
                    "from emp", db)

    def test_star_with_window_rejected(self, db):
        with pytest.raises(SqlError):
            execute("select *, rank() over (order by sal) from emp", db)

    def test_ranker_with_args_rejected(self, db):
        with pytest.raises(SqlError):
            execute("select row_number(id) over () from emp", db)

    def test_distinct_window_agg_rejected(self, db):
        with pytest.raises(SqlError):
            execute("select sum(distinct sal) over () from emp", db)


class TestLagLeadDefaultTyping:
    def test_incompatible_default_plan_time_error(self, db):
        # round-4 advisor: lag(int, 1, 'x') must be a plan-time SqlError,
        # not an internal ValueError at execution
        with pytest.raises(SqlError):
            execute("select lag(sal, 1, 'x') over (order by id) "
                    "from emp", db)

    def test_numeric_chain_default_promotes(self, db):
        # PG anyelement resolution: common type of int4 and numeric is
        # numeric; the default value survives un-truncated
        r = execute("select lag(sal, 1, 0.5) over (order by id) from emp "
                    "order by 1 nulls last", db).rows
        assert r[0][0] == pytest.approx(0.5)


class TestFastSlowDifferential:
    """The vectorized tier against the exact per-row path on random data
    big enough to engage every fast branch (rankers, offsets, count,
    min/max segmented argmax, int prefix-sum aggregates, sequential
    float/numeric transitions)."""

    QUERIES = [
        "select id, row_number() over (partition by dept order by sal desc, id) from big order by id",
        "select id, rank() over (partition by grp order by sal nulls first) from big order by id",
        "select id, dense_rank() over (order by txt desc nulls last, sal) from big order by id",
        "select id, lag(sal, 2) over (partition by grp order by id) from big order by id",
        "select id, lead(txt, 1, 'zz') over (order by id) from big order by id",
        "select id, first_value(f) over (partition by dept order by sal, id) from big order by id",
        "select id, last_value(f) over (partition by grp order by sal) from big order by id",
        "select id, count(*) over (partition by dept order by sal) from big order by id",
        "select id, count(f) over (partition by grp order by sal) from big order by id",
        "select id, min(sal) over (partition by dept order by id) from big order by id",
        "select id, max(txt) over (partition by grp order by id) from big order by id",
        "select id, min(f) over (partition by dept order by id) from big order by id",
        "select id, sum(sal) over (partition by grp order by sal, id) from big order by id",
        "select id, avg(sal) over (partition by dept order by id) from big order by id",
        "select id, sum(f) over (partition by grp order by id) from big order by id",
        "select id, avg(num) over (partition by dept order by id) from big order by id",
        "select id, max(f) over (order by id) from big order by id",
        "select id, rank() over (order by f desc) from big order by id",
    ]

    @pytest.fixture(scope="class")
    def bigdb(self):
        import numpy as np
        from decimal import Decimal
        rng = np.random.default_rng(7)
        n = 1500
        ids = list(range(1, n + 1))
        depts = [None if rng.random() < 0.05 else
                 f"d{int(rng.integers(0, 7))}" for _ in range(n)]
        grps = [int(rng.integers(0, 40)) for _ in range(n)]
        sals = [None if rng.random() < 0.1 else int(rng.integers(0, 50))
                for _ in range(n)]
        fs = [None if rng.random() < 0.1 else
              (float("nan") if rng.random() < 0.05 else
               (-0.0 if rng.random() < 0.05 else
                float(np.float32(rng.normal())))) for _ in range(n)]
        txts = [None if rng.random() < 0.1 else
                f"t{int(rng.integers(0, 25)):02d}" for _ in range(n)]
        nums = [None if rng.random() < 0.1 else
                Decimal(int(rng.integers(-999, 999))) / Decimal(10)
                for _ in range(n)]
        d = Database()
        d.create(Table.from_columns("big", {
            "id": column_from_values(T.INT4, ids),
            "dept": column_from_values(T.TEXT, depts),
            "grp": column_from_values(T.INT4, grps),
            "sal": column_from_values(T.INT4, sals),
            "f": column_from_values(T.FLOAT8, fs),
            "txt": column_from_values(T.TEXT, txts),
            "num": column_from_values(T.NUMERIC, nums),
        }))
        return d

    @pytest.mark.parametrize("q", QUERIES)
    def test_fast_matches_slow(self, q, bigdb, monkeypatch, _both_paths):
        fast = execute(q, bigdb).rows     # tier chosen by _both_paths
        monkeypatch.setattr(_cfg, "vectorized_windows", False)
        monkeypatch.setattr(winmod, "_FAST_MIN_ROWS", 1 << 30)
        slow = execute(q, bigdb).rows
        assert len(fast) == len(slow)
        for a, b in zip(fast, slow):
            assert repr(a) == repr(b), (a, b)


class TestWindowEdges:
    def test_empty_filter_result(self, db):
        r = execute("select id, rank() over (order by sal) from emp "
                    "where sal > 10000", db).rows
        assert r == []

    def test_window_in_from_subquery(self, db):
        r = execute("select rn from (select id, row_number() over "
                    "(order by sal desc, id) rn from emp) q "
                    "where rn <= 2 order by rn", db).rows
        assert r == [(1,), (2,)]

    def test_two_specs_different_partitions(self, db):
        r = execute("select id, rank() over (partition by dept order by "
                    "sal), count(*) over (order by id) from emp "
                    "order by id limit 3", db).rows
        assert r == [(1, 1, 1), (2, 2, 2), (3, 2, 3)]

    def test_minmax_tie_display_with_interleaved_nulls(self):
        # round-5 review: _dense_ranks sorted raw lanes without the null
        # flag, so NULL rows (data plane 0) split a -0.0/0.0 equal run
        # and max() displayed the wrong tie occurrence
        import random
        r = random.Random(5)
        vals = [r.choice([-0.0, 0.0, None, 1.5]) for _ in range(400)]
        d = Database()
        d.create(Table.from_columns("t", {
            "v": column_from_values(T.INT4, list(range(400))),
            "f": column_from_values(T.FLOAT8, vals),
        }))
        fast = execute("select v, max(f) over (order by v) from t", d).rows
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(_cfg, "vectorized_windows", False)
            mp.setattr(winmod, "_FAST_MIN_ROWS", 1 << 30)
            slow = execute("select v, max(f) over (order by v) from t",
                           d).rows
        assert [repr(x) for x in fast] == [repr(x) for x in slow]
