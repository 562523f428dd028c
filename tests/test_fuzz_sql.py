"""Differential SQL fuzzing: random queries, device path vs host path.

The reference's whole test strategy is differential — run the same corpus
with the GPU path on and off and diff the output (SURVEY §4;
/root/reference/test/*.sql with enable.conf/disable.conf).  This suite is
that contract over a SEEDED RANDOM corpus (utils/sqlgen.QueryGen): every
generated statement must produce identical results — or identical errors —
with pg_strom.enabled on and off, across randomized engine configs
(chunk sizes, device group capacity) that force different execution tiers
(scatter vs sort grouping, chunk loops, capacity regrows, host fallbacks).

Seeds are fixed, so CI is deterministic; tools/fuzz_sql.py runs the same
generator open-ended for soak testing.
"""

import random

import pytest

import pg_strom_tpu  # noqa: F401
from pg_strom_tpu import T, Table, column_from_values, override
from pg_strom_tpu.datastore import Database
from pg_strom_tpu.errors import SqlError
from pg_strom_tpu.models.fixtures import make_preagg_test
from pg_strom_tpu.sql import execute
from pg_strom_tpu.utils.sqlgen import QueryGen, TableSpec

N_PER_SEED = 6
SEEDS = list(range(12))


def fuzz_schema():
    tables = [
        TableSpec("gpupreagg_test", {
            "id": "int", "key": "int", "smlint_x": "int", "integer_x": "int",
            "bigint_x": "int", "real_x": "float", "float_x": "float",
            "nume_x": "numeric",
        }, unique_col="id"),
        TableSpec("fuzz_dim", {"k": "int", "pk": "int", "nm": "text",
                               "w": "float"}),
        TableSpec("fuzz_dim2", {"k2": "int", "nm2": "text"}),
        TableSpec("fuzz_skew", {"sid": "int", "hk": "int", "v": "int",
                                "f": "float"}, unique_col="sid"),
    ]
    # star: gpupreagg_test anchors two dims; snowflake: fuzz_dim -> dim2;
    # fuzz_skew's hk is 90% one key (the skew-routing trigger)
    pairs = [("gpupreagg_test", "key", "fuzz_dim", "k"),
             ("gpupreagg_test", "key", "fuzz_dim2", "k2"),
             ("fuzz_dim", "pk", "fuzz_dim2", "k2"),
             ("fuzz_skew", "hk", "fuzz_dim", "k")]
    return tables, pairs


def make_fuzz_dim() -> Table:
    # duplicates (3,7,11 twice), gaps (no 2,5,...), NULL keys, keys outside
    # the fact's [1,31] range — every join cardinality case in one dim
    ks = [1, 3, 3, 4, 7, 7, 9, 11, 11, 13, 17, 21, 25, 29, 31, 40, 41,
          None, None]
    nms = [f"n{k}" if k is not None else None for k in ks]
    ws = [float(k) / 2 if k is not None else None for k in ks]
    ws[3] = None           # a NULL float on a matched key
    pks = [None if k is None else (k % 5) + 1 for k in ks]   # snowflake key
    pks[5] = None          # a NULL parent on a matched key
    return Table.from_columns("fuzz_dim", {
        "k": column_from_values(T.INT4, ks),
        "pk": column_from_values(T.INT4, pks),
        "nm": column_from_values(T.TEXT, nms),
        "w": column_from_values(T.FLOAT8, ws),
    })


def make_fuzz_dim2() -> Table:
    # parent dim: covers pk range 1..5 with a gap (no 4), a dup (2), a
    # NULL, and an unreferenced key (9)
    k2 = [1, 2, 2, 3, 5, 9, None]
    return Table.from_columns("fuzz_dim2", {
        "k2": column_from_values(T.INT4, k2),
        "nm2": column_from_values(T.TEXT,
                                  [None if v is None else f"p{v}"
                                   for v in k2]),
    })


def make_fuzz_skew(nrows: int = 400) -> Table:
    # 90% of keys are 7 — the heavy-hitter shape dist_skew_routing exists
    # for (round-4 engine integration; fuzzed here per round-4 verdict)
    import random as _random
    r = _random.Random(99)
    hks = [7 if r.random() < 0.9 else r.choice(
        [1, 3, 4, 11, 25, 40, None]) for _ in range(nrows)]
    return Table.from_columns("fuzz_skew", {
        "sid": column_from_values(T.INT4, list(range(1, nrows + 1))),
        "hk": column_from_values(T.INT4, hks),
        "v": column_from_values(T.INT4,
                                [r.randint(-50, 50) for _ in range(nrows)]),
        "f": column_from_values(T.FLOAT8,
                                [None if r.random() < 0.1 else
                                 round(r.uniform(-2, 2), 6)
                                 for _ in range(nrows)]),
    })


def build_fuzz_db() -> Database:
    d = Database()
    d.create(make_preagg_test(nrows=600))
    d.create(make_fuzz_dim())
    d.create(make_fuzz_dim2())
    d.create(make_fuzz_skew())
    return d


def rand_cfg(rng) -> dict:
    """Randomized engine config — the round-4 verdict's widened axes:
    distributed mesh execution (8 virtual devices in tests), 2D mesh
    shape, skew routing, device DISTINCT, and the window tier choice all
    fuzz alongside the original chunk/capacity knobs."""
    return {
        "chunk_rows": rng.choice([97, 256, 1024]),
        "max_groups_device": rng.choice([8, 64, 512]),
        "distributed": rng.random() < 0.35,
        "dist_mesh_hosts": rng.choice([1, 1, 1, 2]),
        "dist_skew_routing": rng.random() < 0.7,
        "device_distinct": rng.random() < 0.7,
        "vectorized_windows": rng.random() < 0.7,
    }


@pytest.fixture(scope="module")
def db():
    return build_fuzz_db()


def run_one(db, sql, device, cfg):
    """Execute under one path; normalize to a comparable outcome."""
    try:
        with override(enabled=device, **cfg):
            r = execute(sql, db)
        return ("rows", tuple(r.columns), tuple(r.formatted(-3)))
    except SqlError as e:
        return ("error", str(e))


def _mant_digits(s: str) -> int:
    m = s.split("e")[0].split("E")[0].lstrip("-+").replace(".", "")
    return len(m.lstrip("0"))


def _cells_match_tolerant(ra: str, rb: str) -> bool:
    ca, cb = ra.split("|"), rb.split("|")
    if len(ca) != len(cb):
        return False
    for va, vb in zip(ca, cb):
        if va == vb:
            continue
        # integer-rendered cells (counts, int sums) are exact even
        # distributed — only float renderings may drift
        if not any(c in va for c in ".eE") or \
                not any(c in vb for c in ".eE"):
            return False
        try:
            fa, fb = float(va), float(vb)
        except ValueError:
            return False
        if fa == fb:
            continue
        # the underlying drift is ~1 ulp; display rounding quantizes it
        # to one unit of the LAST rendered digit when it crosses a
        # boundary.  extra_float_digits -3 renders float4 with 3
        # significant digits ('3.63' vs '3.64') and float8 with 12 — the
        # tolerance scales with the rendering width (review finding: a
        # flat 1.5e-2 would have accepted real 1% float8 errors).
        nd = max(_mant_digits(va), _mant_digits(vb))
        tol = 1.5e-2 if nd <= 4 else 1e-10
        if abs(fa - fb) > tol * max(abs(fa), abs(fb)):
            return False
    return True


def outcomes_match(dev, host, cfg) -> bool:
    """Exact match, except: under `distributed` the mesh merges float
    partials in shard order, so float SUM/AVG cells may differ by an ulp
    — the same order-dependence PostgreSQL's own parallel aggregation
    has (its docs call float aggregate results plan-dependent).  The
    single-device contract stays bit-exact."""
    if dev == host:
        return True
    if not cfg.get("distributed"):
        return False
    if dev[0] != "rows" or host[0] != "rows" or dev[1] != host[1] \
            or len(dev[2]) != len(host[2]):
        return False
    if all(_cells_match_tolerant(a, b) for a, b in zip(dev[2], host[2])):
        return True
    # unordered sets are string-sorted before this call, so a drifting
    # float in a leading cell can misalign the zip (review finding):
    # fall back to greedy row matching under the same tolerance
    if len(dev[2]) > 2000:
        return False
    used = [False] * len(host[2])
    for ra in dev[2]:
        for j, rb in enumerate(host[2]):
            if not used[j] and _cells_match_tolerant(ra, rb):
                used[j] = True
                break
        else:
            return False
    return True


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_differential(db, seed):
    rng = random.Random(seed)
    tables, pairs = fuzz_schema()
    gen = QueryGen(rng, tables, pairs)
    cfg = rand_cfg(rng)
    for i in range(N_PER_SEED):
        sql, ordered = gen.gen()
        dev = run_one(db, sql, True, cfg)
        host = run_one(db, sql, False, cfg)
        if dev[0] == host[0] == "rows" and not ordered:
            dev = (dev[0], dev[1], tuple(sorted(dev[2])))
            host = (host[0], host[1], tuple(sorted(host[2])))
        assert outcomes_match(dev, host, cfg), (
            f"seed={seed} q#{i} cfg={cfg}\nSQL: {sql}\n"
            f"dev : {dev[:2]} {str(dev[2:])[:400]}\n"
            f"host: {host[:2]} {str(host[2:])[:400]}")


@pytest.mark.parametrize("seed", list(range(6)))
def test_fuzz_dml_differential(seed):
    """UPDATE/DELETE under both paths on separate database copies, then
    diff the whole table (round-4 verdict item 6: DML was never fuzzed)."""
    rng = random.Random(1000 + seed)
    tables, pairs = fuzz_schema()
    gen = QueryGen(rng, tables, pairs)
    for i in range(4):
        tname = rng.choice(["fuzz_dim", "fuzz_skew"])
        sql = gen.gen_dml(tname)
        cfg = rand_cfg(rng)
        outs = []
        for dev in (True, False):
            d = build_fuzz_db()
            res = run_one(d, sql, dev, cfg)
            if res[0] == "error":
                outs.append(res)
                continue
            chk = run_one(d, f"select * from {tname}", dev, cfg)
            outs.append((chk[0], chk[1], tuple(sorted(chk[2]))))
        assert outs[0] == outs[1], (
            f"seed={seed} q#{i} cfg={cfg}\nSQL: {sql}\n"
            f"dev : {str(outs[0])[:400]}\nhost: {str(outs[1])[:400]}")


class TestFuzzFoundRegressions:
    """Distilled repros for bugs the fuzzer found (kept as fixed tests)."""

    def test_device_min_max_text_through_join(self, db):
        # round 4: device min/max over a TEXT arg returned raw dict codes
        # (and host-replay partials hold strings — mixed merges). Now the
        # code decodes against the order-preserving dictionary at
        # extraction (ops/preagg.extract_partials text_dict).
        sql = ("select gpupreagg_test.key, min(fuzz_dim.nm), "
               "max(fuzz_dim.nm) from gpupreagg_test join fuzz_dim "
               "on gpupreagg_test.key = fuzz_dim.k "
               "group by gpupreagg_test.key")
        dev = run_one(db, sql, True, {})
        host = run_one(db, sql, False, {})
        assert dev[0] == "rows" and sorted(dev[2]) == sorted(host[2])
        # every value decodes to a string, never an int code
        assert all(v.split("|")[1].startswith("n") for v in dev[2])

    def test_device_min_max_text_single_table(self, db):
        sql = "select min(nm), max(nm) from fuzz_dim"
        dev = run_one(db, sql, True, {})
        host = run_one(db, sql, False, {})
        assert dev == host == ("rows", ("min", "max"), ("n1|n9",))

    def test_outer_join_text_dictionary_consistency(self, db):
        # round 4: the host join's matched-rows piece rebuilt a FRESH
        # (smaller) dictionary, then outer-join NULL-extension appended
        # rows carrying ORIGINAL codes — IndexError / silently wrong
        # strings.  _to_table now re-encodes against the source
        # dictionary and _concat_tables union-remaps as a net.
        sql = ("select gpupreagg_test.bigint_x, count(fuzz_dim.nm) "
               "from gpupreagg_test right join fuzz_dim "
               "on gpupreagg_test.key = fuzz_dim.k "
               "group by gpupreagg_test.bigint_x")
        cfg = {"chunk_rows": 1024, "max_groups_device": 8}
        dev = run_one(db, sql, True, cfg)
        host = run_one(db, sql, False, cfg)
        assert dev[0] == host[0] == "rows"
        assert sorted(dev[2]) == sorted(host[2])

    def test_unmatched_dim_names_survive_right_join(self, db):
        # the unmatched dim rows carry names ABSENT from the matched
        # dictionary (n31/n40/n41) — they must come through intact
        sql = ("select fuzz_dim.nm from gpupreagg_test right join fuzz_dim "
               "on gpupreagg_test.key = fuzz_dim.k where "
               "gpupreagg_test.id is null")
        for dev in (True, False):
            out = run_one(db, sql, dev, {})
            assert out[0] == "rows"
            assert sorted(v for v in out[2]) == ["", "", "n31", "n40", "n41"]


    def test_float8_minmax_sentinel_beyond_two(self, db):
        # round 4: the f8 min/max order-key sentinel was 2^62 — but every
        # double >= 2.0 has okey >= 2^62 (bits of 2.0 = 0x4000...), so a
        # group whose true min was >= 2.0 returned a phantom 2.0 whenever
        # a padding/invalid row shared its segment (and -2.0 for max).
        # Sentinels are int64 extremes now (ops/preagg.py _slot_minmax).
        sql = ("select k, min(w), max(w) from fuzz_dim group by k "
               "order by k nulls last")
        base = None
        for mg in (8, 16, 64):      # sort-fallback, dense, scatter tiers
            for dev in (True, False):
                out = run_one(db, sql, dev,
                              {"chunk_rows": 97, "max_groups_device": mg})
                assert out[0] == "rows"
                if base is None:
                    base = out
                assert out == base, (mg, dev)
        assert "7|3.5|3.5" in base[2]          # was 7|2|2 on device

    def test_ungrouped_column_is_sql_error(self, db):
        # round 5: the widened fuzzer's first find — a select-list key in
        # no grouping set escaped as an internal RuntimeError from the
        # final projection; PG raises a plan-level error
        for q in ("select hk, v, grouping(hk), min(f) from fuzz_skew "
                  "group by grouping sets ((), (), (hk))",
                  "select v from fuzz_skew group by hk",
                  "select v, count(*) from fuzz_skew"):
            for dev in (True, False):
                out = run_one(db, q, dev, {})
                assert out[0] == "error" and "GROUP BY" in out[1], (q, out)

    def test_count_star_chunk_cache_no_cross_table_collision(self, db):
        # round-5 fuzzer find: count(*) layouts reference no columns, so
        # the device chunk cache keyed them as ("chunks", (), cap) — a
        # 12-row recursive worktable's cached chunks then served
        # count(*) over the 600-row fact (12 instead of 600)
        sql = ("with recursive s(n) as (select 1 union all select n+2 "
               "from s where n < 23) select (select count(*) from s), "
               "count(*) from gpupreagg_test")
        cfg = {"chunk_rows": 97, "max_groups_device": 64}
        dev = run_one(db, sql, True, cfg)
        host = run_one(db, sql, False, cfg)
        assert dev == host == ("rows", ("?column?", "count"), ("12|600",))
        # the distributed executor's resident-lane cache had the SAME
        # empty-layout collision (dist_exec._resident_args)
        dcfg = dict(cfg, distributed=True)
        dev = run_one(db, sql, True, dcfg)
        host = run_one(db, sql, False, dcfg)
        assert dev == host == ("rows", ("?column?", "count"), ("12|600",))

    def test_distributed_join_filter_binds_to_probe_layout(self, db):
        # round-5 fuzzer find #4: the dist join path lowered per-rel
        # WHERE quals with unbound ColumnRefs (index -1), silently
        # reading the LAST column's planes — numeric-plane crashes on
        # some shapes, wrong-column filters on others
        sql = ("select gpupreagg_test.smlint_x, sum(fuzz_dim.w) "
               "from gpupreagg_test join fuzz_dim "
               "on gpupreagg_test.key = fuzz_dim.k "
               "where gpupreagg_test.float_x <= 0.790 "
               "and gpupreagg_test.smlint_x > 0 "
               "group by gpupreagg_test.smlint_x")
        cfg = {"distributed": True, "chunk_rows": 97}
        dev = run_one(db, sql, True, cfg)
        host = run_one(db, sql, False, cfg)
        assert dev[0] == host[0] == "rows"
        assert sorted(dev[2]) == sorted(host[2])


def test_generator_is_deterministic():
    tables, pairs = fuzz_schema()
    a = [QueryGen(random.Random(7), tables, pairs).gen() for _ in range(10)]
    b = [QueryGen(random.Random(7), tables, pairs).gen() for _ in range(10)]
    assert a == b
