"""SQL-level regression tests: parser/binder/planner end-to-end.

Device-vs-host differential at the SQL surface, mirroring how the reference
suite runs every query twice via enable.conf / disable.conf (SURVEY §4).
Includes the gpupreagg_mix pattern: a 3-way self-join with subqueries
(agg_init.sql materialized view) feeding grouped aggregates.
"""

import pytest

import pg_strom_tpu  # noqa: F401
from pg_strom_tpu import override
from pg_strom_tpu.datastore import Database
from pg_strom_tpu.models.fixtures import make_preagg_test, make_preagg_zero
from pg_strom_tpu.sql import execute, explain
from pg_strom_tpu.sql.parser import parse, ParseError


@pytest.fixture(scope="module")
def db():
    d = Database()
    d.create(make_preagg_test(nrows=600))
    d.create(make_preagg_zero())
    return d


def both(db, sql, efd=-3, chunk_rows=256):
    outs = []
    for device in (True, False):
        with override(enabled=device, chunk_rows=chunk_rows,
                      max_groups_device=64):
            r = execute(sql, db)
        outs.append((r.columns, r.formatted(efd)))
    assert outs[0] == outs[1], f"device != host for {sql}\n" \
        f"dev : {outs[0][1][:4]}\nhost: {outs[1][1][:4]}"
    return outs[0][1]


class TestBasicSelect:
    def test_count_star(self, db):
        assert both(db, "select count(*) from gpupreagg_test") == ["600"]

    def test_projection_filter_order(self, db):
        rows = both(db, "select id, smlint_x from gpupreagg_test "
                        "where id between 10 and 20 and smlint_x is not null "
                        "order by smlint_x desc, id limit 5")
        assert len(rows) == 5

    def test_expressions(self, db):
        both(db, "select id, smlint_x + 1, integer_x * 2, bigint_x / 3, "
                 "abs(float_x), -real_x from gpupreagg_test "
                 "where id < 50 order by id")

    def test_case_when(self, db):
        both(db, "select id, case when smlint_x > 0 then 'pos' "
                 "when smlint_x < 0 then 'neg' else 'zero-or-null' end "
                 "from gpupreagg_test where id <= 30 order by id")

    def test_in_list(self, db):
        assert both(db, "select count(*) from gpupreagg_test where key in (1, 2, 3)")

    def test_coalesce(self, db):
        both(db, "select id, coalesce(smlint_x, -1) from gpupreagg_test "
                 "where id <= 40 order by id")

    def test_cast_syntax(self, db):
        both(db, "select id, smlint_x::bigint, cast(integer_x as float) "
                 "from gpupreagg_test where id <= 20 order by id")

    def test_zero_table(self, db):
        assert both(db, "select sum(integer_x), avg(float_x), count(*) "
                        "from gpupreagg_zero_test") == ["||0"]


class TestAggSql:
    def test_nogrp(self, db):
        both(db, "select avg(smlint_x), count(integer_x), max(bigint_x), "
                 "min(real_x), sum(float_x), stddev(nume_x) from gpupreagg_test")

    def test_group_order(self, db):
        rows = both(db, "select key, variance(integer_x), corr(float_x, float_x) "
                        "from gpupreagg_test group by key order by key")
        assert len(rows) == 31  # 30 keys + NULL group

    def test_where_group(self, db):
        both(db, "select key, sum(smlint_x) from gpupreagg_test "
                 "where key = 1 group by key order by key")

    def test_agg_expr_args(self, db):
        both(db, "select key, sum(smlint_x + 1), avg(integer_x * 2) "
                 "from gpupreagg_test group by key order by key")

    def test_agg_in_expression(self, db):
        both(db, "select key, sum(integer_x) / count(integer_x), "
                 "max(smlint_x) - min(smlint_x) from gpupreagg_test "
                 "group by key order by key")

    def test_having(self, db):
        rows = both(db, "select key, count(*) from gpupreagg_test group by key "
                        "having count(*) > 15 order by key")
        for r in rows:
            assert int(r.split("|")[1]) > 15

    def test_group_by_ordinal_and_alias_order(self, db):
        both(db, "select key as k, sum(integer_x) as s from gpupreagg_test "
                 "group by 1 order by s desc nulls last, k")

    def test_count_star_grouped(self, db):
        both(db, "select key, count(*) from gpupreagg_test group by key order by key")


class TestJoins:
    def test_explicit_join(self, db):
        both(db, "select count(*) from gpupreagg_test a "
                 "join gpupreagg_test b on a.id = b.id where a.key <= 5")

    def test_mix_three_way_self_join(self, db):
        # the gpupreagg_mix materialized-view pattern (agg_init.sql)
        sql = """
        select x.key, avg(x.smlint_x), sum(y.integer_x), corr(x.float_x, z.float_x)
        from (select * from gpupreagg_test where id <= 150) as x,
             (select id - 150 as id, key, smlint_x, integer_x, float_x
                from gpupreagg_test where id between 151 and 300) as y,
             (select id - 300 as id, key, smlint_x, integer_x, float_x
                from gpupreagg_test where id between 301 and 450) as z
        where x.id = y.id and y.id = z.id and z.id = x.id
        group by x.key order by x.key
        """
        rows = both(db, sql)
        assert len(rows) >= 1

    def test_join_payload_agg(self, db):
        both(db, "select a.key, sum(b.integer_x) from gpupreagg_test a "
                 "join gpupreagg_test b on a.id = b.id "
                 "group by a.key order by a.key")


class TestExplain:
    def test_shapes(self, db):
        with override(enabled=True):
            txt = explain("select key, avg(smlint_x) from gpupreagg_test "
                          "group by key order by key", db)
        assert "TpuPreAgg" in txt and "TpuScan" in txt and "Sort" in txt
        with override(enabled=False):
            txt = explain("select key, avg(smlint_x) from gpupreagg_test "
                          "group by key order by key", db)
        assert "HashAggregate" in txt and "SeqScan" in txt

    def test_device_filter_shown(self, db):
        txt = explain("select count(*) from gpupreagg_test where key = 1", db)
        assert "Device Filter" in txt and "key" in txt

    def test_explain_statement(self, db):
        r = execute("explain (verbose, costs off) select count(*) "
                    "from gpupreagg_test", db)
        assert r.command == "EXPLAIN"
        assert any("TpuPreAgg" in row[0] for row in r.rows)


class TestSet:
    def test_set_guc_names(self, db):
        execute("set pg_strom.enabled = off", db)
        from pg_strom_tpu.config import config
        assert config.enabled is False
        execute("set pg_strom.enabled to on", db)
        assert config.enabled is True
        execute("set extra_float_digits to -3", db)
        execute("set client_min_messages to warning", db)
        r = execute("select 1 + 1", db)
        assert r.rows == [(2,)]


class TestTableLess:
    def test_scalar(self, db):
        assert execute("select 1 + 2 * 3", db).rows == [(7,)]

    def test_recheck_agg_literals(self, db):
        # recheck_agg.sql corpus: numeric literals around the device window
        for lit, want in [("0", "0"), ("1E+48", "1000000000000000000000000000000000000000000000000"),
                          ("1E-32", "0.00000000000000000000000000000001")]:
            r = execute(f"select sum({lit})", db)
            assert r.formatted()[0] == want, (lit, r.formatted())

    def test_recheck_agg_out_of_window(self, db):
        for lit in ("1E-33", "1E+49", "1E+1000", "1E-1000"):
            r = execute(f"select sum({lit})", db)
            # host-exact path: value round-trips exactly
            from decimal import Decimal
            assert Decimal(r.formatted()[0]) == Decimal(lit)


class TestParseErrors:
    def test_syntax_error(self):
        with pytest.raises(ParseError):
            parse("select from where")

    def test_unknown_column(self, db):
        from pg_strom_tpu.plan.binder import BindError
        with pytest.raises(BindError):
            execute("select nonexistent from gpupreagg_test", db)

    def test_unknown_table(self, db):
        with pytest.raises(KeyError):
            execute("select * from no_such_table", db)


class TestExplainAnalyzePerfmon:
    """EXPLAIN ANALYZE perfmon rendering (main.c:504-660 analog): per-kernel
    device times under a Device Kernels section plus transfer lines."""

    def test_device_kernels_section(self, db):
        r = execute("explain analyze select key, sum(smlint_x) "
                    "from gpupreagg_test group by key", db)
        txt = "\n".join(row[0] for row in r.rows)
        assert "Device Kernels:" in txt
        assert "kernel tpupreagg" in txt
        assert "Execution Time:" in txt
        assert "(actual rows=" in txt

    def test_transfer_bandwidth_line(self, db):
        from pg_strom_tpu.exec.devcache import TCACHE
        TCACHE.clear()                    # force a fresh h2d upload
        r = execute("explain analyze select count(*) from gpupreagg_test "
                    "where integer_x > 0", db)
        txt = "\n".join(row[0] for row in r.rows)
        assert "h2d:" in txt and "MB" in txt
