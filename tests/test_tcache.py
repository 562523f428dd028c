"""Device chunk cache (tcache analog, exec/devcache.py).

Covers: cross-query reuse of device-resident planes and join hash tables,
correctness under cache hits, LRU byte-budget eviction, streaming fallback
when the table exceeds the budget, and release on table drop (the restrack
ownership analog: dead Columns are swept).
"""

import gc

import numpy as np
import pytest

import pg_strom_tpu  # noqa: F401
from pg_strom_tpu import override
from pg_strom_tpu.datastore import Database, Table, column_from_values
from pg_strom_tpu.sqltypes import T
from pg_strom_tpu.sql import execute
from pg_strom_tpu.exec.devcache import TCACHE, chunk_capacity


@pytest.fixture()
def db(rng):
    d = Database()
    n = 3000
    d.create(Table.from_columns("t", {
        "k": column_from_values(T.INT4, list(rng.integers(0, 7, n))),
        "x": column_from_values(T.FLOAT4, list(map(float, rng.random(n)))),
        "y": column_from_values(T.INT8, list(rng.integers(-100, 100, n))),
    }))
    d.create(Table.from_columns("dim", {
        "k": column_from_values(T.INT4, list(range(7))),
        "label": column_from_values(T.INT8, [10 * i for i in range(7)]),
    }))
    return d


def _run(db, sql):
    return execute(sql, db).formatted(-3)


class TestChunkCacheReuse:
    def test_repeat_query_hits_cache(self, db):
        TCACHE.clear()
        sql = "select k, sum(x), count(*) from t where y > 0 group by k"
        with override(chunk_rows=1024):
            first = _run(db, sql)
            h0 = TCACHE.hits
            second = _run(db, sql)
        assert first == second
        assert TCACHE.hits > h0, "second run should reuse device planes"

    def test_different_queries_share_planes(self, db):
        TCACHE.clear()
        with override(chunk_rows=1024):
            _run(db, "select sum(y) from t")
            h0 = TCACHE.hits
            _run(db, "select count(*) from t where x > 0.5")
        assert TCACHE.hits > h0, "scan and preagg share the chunk entry"

    def test_join_hash_table_reused(self, db):
        TCACHE.clear()
        sql = ("select sum(dim.label) from t join dim on t.k = dim.k "
               "where t.x > 0.1")
        with override(chunk_rows=1024):
            first = _run(db, sql)
            aux_before = [r for r in TCACHE.info_rows() if r["kind"] == "aux"]
            h0 = TCACHE.hits
            second = _run(db, sql)
        assert first == second
        assert aux_before, "join build should cache its hash table"
        assert TCACHE.hits > h0

    def test_results_match_host_with_cache_warm(self, db):
        TCACHE.clear()
        sql = "select k, sum(x), min(y), max(y) from t group by k order by k"
        with override(chunk_rows=512):
            dev1 = _run(db, sql)
            dev2 = _run(db, sql)   # warm
        with override(enabled=False):
            host = _run(db, sql)
        assert dev1 == dev2 == host


class TestBudgetAndEviction:
    def test_zero_budget_streams(self, db):
        TCACHE.clear()
        sql = "select sum(y) from t"
        with override(chunk_rows=1024, tcache_size_mb=0):
            s0 = TCACHE.streamed
            out = _run(db, sql)
            assert TCACHE.streamed > s0
            assert TCACHE.total_bytes() == 0
        with override(enabled=False):
            assert out == _run(db, sql)

    def test_lru_eviction_under_pressure(self, rng):
        TCACHE.clear()
        d = Database()
        n = 4096
        for i in range(6):
            d.create(Table.from_columns(f"t{i}", {
                "v": column_from_values(T.INT8, list(rng.integers(0, 9, n))),
            }))
        # each table ~ 4096 * (8 + 1) bytes of planes; budget 1 MB holds
        # everything, so shrink far below the working set via chunk cap

        with override(chunk_rows=4096, tcache_size_mb=1):
            budget = TCACHE.budget_bytes()
            for i in range(6):
                _run(d, f"select sum(v) from t{i}")
            assert TCACHE.total_bytes() <= budget

    def test_disable_tcache_guc(self, db):
        TCACHE.clear()
        with override(enable_tcache=False, chunk_rows=1024):
            out = _run(db, "select count(*) from t where x > 0.25")
            assert TCACHE.total_bytes() == 0
        with override(enabled=False):
            assert out == _run(db, "select count(*) from t where x > 0.25")


class TestInvalidationAndRelease:
    def test_replaced_table_not_stale(self, rng):
        TCACHE.clear()
        d = Database()
        d.create(Table.from_columns("r", {
            "v": column_from_values(T.INT4, [1] * 100)}))
        with override(chunk_rows=256):
            assert _run(d, "select sum(v) from r") == ["100"]
            d.create(Table.from_columns("r", {
                "v": column_from_values(T.INT4, [2] * 100)}))
            assert _run(d, "select sum(v) from r") == ["200"]

    def test_drop_releases_entries(self, rng):
        TCACHE.clear()
        d = Database()
        d.create(Table.from_columns("gone", {
            "v": column_from_values(T.INT8, list(range(2048)))}))
        with override(chunk_rows=1024):
            _run(d, "select sum(v) from gone")
        assert TCACHE.total_bytes() > 0
        d.drop("gone")
        gc.collect()
        TCACHE._sweep()
        assert all(r["table_name"] != "gone" for r in TCACHE.info_rows())

    def test_introspection_virtual_table(self, db):
        TCACHE.clear()
        with override(chunk_rows=1024):
            _run(db, "select sum(y) from t")
            rows = _run(db, "select table_name, kind, nbytes "
                            "from pgstrom_tcache_info order by table_name")
        assert any("t" in r for r in rows)


class TestCapacityHelper:
    def test_chunk_capacity_shared(self):
        with override(chunk_rows=1 << 20):
            assert chunk_capacity(40_000) == 65536
            assert chunk_capacity(5) == 1024
            assert chunk_capacity(3 << 20) == 1 << 20


def test_concurrent_queries_thread_safe():
    """Concurrent SELECTs are a legitimate serving shape (the reference is
    a multi-backend DBMS): parallel threads over one Database must neither
    crash the LRU (dict-changed-size races) nor return wrong rows."""
    import threading
    import numpy as np
    from pg_strom_tpu import T
    from pg_strom_tpu.config import override
    from pg_strom_tpu.datastore import Database, Table, column_from_numpy
    from pg_strom_tpu.sql.api import execute

    rng = np.random.default_rng(60)
    n = 20000
    db = Database()
    db.create(Table.from_columns("ct", {
        "k": column_from_numpy(T.INT4, rng.integers(0, 9, n).astype(np.int32)),
        "x": column_from_numpy(T.FLOAT8, rng.random(n)),
        "y": column_from_numpy(T.INT8,
                               rng.integers(-100, 100, n).astype(np.int64)),
    }))
    db.create(Table.from_columns("cd", {
        "dk": column_from_numpy(T.INT4, np.arange(9, dtype=np.int32)),
        "w": column_from_numpy(T.INT8, (np.arange(9) * 11).astype(np.int64)),
    }))
    queries = [
        "select k, count(*), sum(x) from ct group by k order by k",
        "select count(*), sum(ct.y), sum(cd.w) from ct, cd where ct.k = cd.dk",
        "select sum(y) from ct where x > 0.5",
        "select k, max(y), min(x) from ct group by k order by k",
    ]
    with override(debug_force_offload=True):
        expected = {q: execute(q, db).rows for q in queries}
    from pg_strom_tpu.exec.devcache import TCACHE
    TCACHE.clear()
    errors: list = []

    def worker(i: int) -> None:
        try:
            with override(debug_force_offload=True, tcache_size_mb=4):
                for r in range(6):
                    q = queries[(i + r) % len(queries)]
                    got = execute(q, db).rows
                    assert got == expected[q], (q, got[:2])
        except Exception as e:  # noqa: BLE001
            errors.append((i, repr(e)))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
