"""Cost-based plan selection (plan/cost.py).

Reference contract: cost_gpuscan (gpuscan.c:101-231), cost_gpuhashjoin
(gpuhashjoin.c:438-668), cost_gpupreagg (gpupreagg.c:366-470), driven by the
gpu_setup/operator/tuple cost GUCs (main.c:167-198); the regression conf
forces offload via pg_strom.debug_force_gpupreagg because test-sized tables
lose on cost (input/enable.conf) — which is exactly what these tests assert.
"""

import pytest

from pg_strom_tpu import T
from pg_strom_tpu.config import config, override
from pg_strom_tpu.datastore import Database, Table, column_from_values
from pg_strom_tpu.sql.api import execute, explain
from pg_strom_tpu.plan.cost import (
    cost_seqscan, cost_tpuscan, cost_hostagg, cost_tpupreagg,
    cost_hashjoin, cost_tpuhashjoin, Cost,
)


@pytest.fixture()
def db():
    db = Database()
    db.create(Table.from_columns("tiny", {
        "k": column_from_values(T.INT4, [i % 3 for i in range(10)]),
        "x": column_from_values(T.FLOAT8, [float(i) for i in range(10)])}))
    n = 300000
    db.create(Table.from_columns("bigt", {
        "k": column_from_values(T.INT4, [i % 30 for i in range(n)]),
        "x": column_from_values(T.FLOAT8, [float(i % 97) for i in range(n)])}))
    db.create(Table.from_columns("dim", {
        "k": column_from_values(T.INT4, list(range(30))),
        "lbl": column_from_values(T.INT8, [i * 10 for i in range(30)])}))
    return db


def test_tiny_table_plans_host(db):
    with override(debug_force_offload=False, debug_force_tpupreagg=False):
        txt = explain("select k, sum(x) from tiny where x > 2 group by k", db)
    assert "SeqScan" in txt
    assert "TpuScan" not in txt
    assert "HashAggregate" in txt and "TpuPreAgg" not in txt


def test_big_table_offloads_scan(db):
    with override(debug_force_offload=False, debug_force_tpupreagg=False):
        txt = explain("select k, sum(x) from bigt where x > 2 group by k", db)
    assert "TpuScan on bigt" in txt


def test_force_flags_override_cost(db):
    with override(debug_force_offload=False, debug_force_tpupreagg=True):
        txt = explain("select k, sum(x) from tiny group by k", db)
        assert "TpuPreAgg" in txt
    with override(debug_force_offload=True):
        txt = explain("select k, sum(x) from tiny where x > 2 group by k", db)
        assert "TpuScan" in txt and "TpuPreAgg" in txt


def test_disabled_beats_force(db):
    with override(enabled=False, debug_force_offload=True):
        txt = explain("select k, sum(x) from tiny group by k", db)
    assert "Tpu" not in txt


def test_explain_costs_rendering(db):
    r = execute("explain select k, sum(x) from bigt where x > 2 group by k",
                db)
    txt = "\n".join(row[0] for row in r.rows)
    assert "cost=" in txt and "rows=" in txt and "width=" in txt
    r = execute("explain (costs off) select k, sum(x) from bigt group by k",
                db)
    txt = "\n".join(row[0] for row in r.rows)
    assert "cost=" not in txt


def test_host_and_device_plans_agree(db):
    q = "select k, sum(x), count(*) from bigt where x > 10 group by k order by k"
    with override(debug_force_offload=False, debug_force_tpupreagg=False,
                  enabled=False):
        host = execute(q, db).rows
    with override(debug_force_offload=True):
        dev = execute(q, db).rows
    assert host == dev


def test_cost_shapes_monotone():
    # setup cost dominates at small N; per-tuple savings dominate at large N
    ch_small = cost_seqscan(100, 16, [])
    ct_small = cost_tpuscan(100, 16, [], [])
    assert ct_small.total > ch_small.total
    assert ct_small.startup >= config.tpu_setup_cost
    # agg: device transition rate is cpu/100 -> wins at scale
    big_in = Cost(0.0, 0.0, 5_000_000, 16)
    assert cost_tpupreagg(big_in, 4, 1, 100, 16).total \
        < cost_hostagg(big_in, 4, 1, 100, 16).total
    # join: probe at tpu_operator_cost wins at scale
    outer = Cost(0.0, 0.0, 5_000_000, 16)
    inner = Cost(0.0, 10.0, 1000, 16)
    assert cost_tpuhashjoin(outer, [inner], [1], 32).total \
        < cost_hashjoin(outer, inner, 1, 32).total


def test_join_offload_decision(db):
    with override(debug_force_offload=False, debug_force_tpupreagg=False):
        txt = explain("select bigt.k, sum(bigt.x) from bigt, dim "
                      "where bigt.k = dim.k group by bigt.k", db)
        assert "TpuHashJoin" in txt
        txt = explain("select tiny.k from tiny, dim "
                      "where tiny.k = dim.k", db)
        assert "TpuHashJoin" not in txt and "HashJoin" in txt


def test_enabled_global_kill_switch(db):
    """pg_strom.enabled_global (main.c:49-102): one global switch disables
    offloading regardless of the session flag or force overrides."""
    from pg_strom_tpu.sql.api import execute
    with override(debug_force_offload=True):
        assert "Tpu" in explain("select k, sum(x) from bigt group by k", db)
        execute("set pg_strom.enabled_global to off", db)
        try:
            txt = explain("select k, sum(x) from bigt group by k", db)
            assert "Tpu" not in txt
            # results still exact on the host tier
            r = execute("select count(*) from bigt", db)
            assert r.rows[0][0] == 300000
        finally:
            execute("set pg_strom.enabled_global to on", db)
        assert "Tpu" in explain("select k, sum(x) from bigt group by k", db)


# ---------------------------------------------------------------------------
# statistics-driven estimation (the ANALYZE analog, round 3)
# ---------------------------------------------------------------------------

def _rows_est(txt: str, node: str) -> int:
    """rows= estimate of the first plan line containing `node`."""
    import re
    for line in txt.splitlines():
        if node in line:
            m = re.search(r"rows=(\d+)", line)
            if m:
                return int(m.group(1))
    raise AssertionError(f"no rows= on node {node}:\n{txt}")


def test_column_stats_basic():
    from pg_strom_tpu.datastore import column_stats
    c = column_from_values(T.INT4, [5, 1, None, 9, 1])
    st = column_stats(c)
    assert (st.nrows, st.null_count) == (5, 1)
    assert (st.min_val, st.max_val) == (1, 9)
    assert st.ndistinct == 3.0 and st.exact_ndistinct
    # cached: same object back
    assert column_stats(c) is st


def test_column_stats_text_and_float():
    from pg_strom_tpu.datastore import column_stats
    c = column_from_values(T.TEXT, ["b", "a", None, "b"])
    st = column_stats(c)
    assert st.ndistinct == 2.0 and st.exact_ndistinct
    f = column_from_values(T.FLOAT8, [1.5, float("nan"), -2.0])
    stf = column_stats(f)
    assert stf.has_nan and stf.min_val == -2.0 and stf.max_val == 1.5


def test_group_count_estimate_from_stats(db):
    """High-cardinality GROUP BY prices G with the real ndistinct: bigt.k
    has 30 distinct values; the Agg row estimate must be ~30, not the
    stats-less nrows/10 fallback (= 30000)."""
    with override(debug_force_offload=False, debug_force_tpupreagg=False):
        r = execute("explain select k, sum(x) from bigt group by k", db)
    txt = "\n".join(row[0] for row in r.rows)
    est = _rows_est(txt, "Agg")
    assert 15 <= est <= 60, txt


def test_filter_rows_estimate_within_2x(db):
    """Range-qual row estimates interpolate on real min/max: x is uniform
    over [0, 96], so x > 48 keeps ~half the 300k rows."""
    with override(debug_force_offload=False, debug_force_tpupreagg=False):
        r = execute("explain select count(*) from bigt where x > 48", db)
    txt = "\n".join(row[0] for row in r.rows)
    est = _rows_est(txt, "Scan")
    true_rows = 300000 * 48 / 97
    assert true_rows / 2 <= est <= true_rows * 2, txt


def test_join_rows_estimate_from_ndistinct(db):
    """Equi-join selectivity = 1/max(nd): bigt JOIN dim ON k keeps every
    bigt row (dim.k unique over bigt.k's domain) -> ~300k, not the
    DEFAULT_EQ_SEL fallback (300000*30*0.005 = 45000)."""
    with override(debug_force_offload=False, debug_force_tpupreagg=False):
        r = execute("explain select bigt.k from bigt, dim "
                    "where bigt.k = dim.k", db)
    txt = "\n".join(row[0] for row in r.rows)
    est = _rows_est(txt, "Join")
    assert 150000 <= est <= 600000, txt


def test_eq_selectivity_outside_range(db):
    """Equality against a constant outside the observed [min,max] prices
    ~zero selectivity."""
    with override(debug_force_offload=False, debug_force_tpupreagg=False):
        r = execute("explain select count(*) from bigt where k = 1000000", db)
    txt = "\n".join(row[0] for row in r.rows)
    est = _rows_est(txt, "Scan")
    assert est <= 5, txt
