"""C++ native runtime tests: arena/buddy allocator with guards, mqueue,
worker pool, CSV loader, PG crc32, glibc random() reproduction."""

import threading

import numpy as np
import pytest

from pg_strom_tpu.native import (
    Arena, MQueue, Pool, PgRandom, pg_crc32, load_csv,
)


class TestArena:
    def test_alloc_free_roundtrip(self):
        a = Arena(1 << 20)
        ptrs = [a.alloc(100 + i * 37) for i in range(50)]
        s = a.stats()
        assert s["n_alloc"] == 50 and s["bytes_live"] > 0
        for p in ptrs:
            a.free(p)
        s = a.stats()
        assert s["n_free"] == 50 and s["bytes_live"] == 0

    def test_buddy_coalescing_allows_big_alloc_after_frees(self):
        a = Arena(1 << 20)
        ptrs = [a.alloc(1000) for _ in range(200)]
        for p in ptrs:
            a.free(p)
        big = a.alloc((1 << 20) - 4096)  # near-whole zone after coalescing
        a.free(big)

    def test_redzone_detection(self):
        import ctypes
        a = Arena(1 << 20)
        p = a.alloc(64)
        ctypes.memset(p + 64, 0x41, 4)  # stomp the redzone
        with pytest.raises(RuntimeError, match="redzone"):
            a.free(p)

    def test_double_free_detected(self):
        a = Arena(1 << 20)
        p = a.alloc(64)
        a.free(p)
        with pytest.raises(RuntimeError, match="double free"):
            a.free(p)

    def test_owner_release_sweep(self):
        a = Arena(1 << 20)
        for _ in range(10):
            a.alloc(256, owner=42)
        keep = a.alloc(256, owner=7)
        assert a.release_owner(42) == 10
        assert a.stats()["bytes_live"] > 0  # owner 7 survives
        a.free(keep)
        assert a.stats()["bytes_live"] == 0

    def test_oom(self):
        a = Arena(1 << 16)
        with pytest.raises(MemoryError):
            a.alloc(1 << 20)


class TestMQueue:
    def test_fifo(self):
        q = MQueue()
        for i in range(10):
            q.push(i)
        assert [q.pop() for _ in range(10)] == list(range(10))

    def test_timeout(self):
        q = MQueue()
        assert q.pop(timeout_ms=50) is None

    def test_close_drains(self):
        q = MQueue()
        q.push(1)
        q.close()
        assert q.pop() == 1
        assert q.pop(timeout_ms=50) is None
        assert not q.push(2)  # closed

    def test_threaded_producer_consumer(self):
        q = MQueue()
        N = 1000
        got = []

        def consumer():
            while True:
                v = q.pop()
                if v is None:
                    break
                got.append(v)

        t = threading.Thread(target=consumer)
        t.start()
        for i in range(N):
            q.push(i)
        q.close()
        t.join()
        assert sorted(got) == list(range(N))


class TestPgRandom:
    def test_glibc_sequence_srandom_1(self):
        # canonical glibc random() sequence for seed 1
        r = PgRandom(seed=1)
        assert [r.random() for _ in range(5)] == [
            1804289383, 846930886, 1681692777, 1714636915, 1957747793]

    def test_setseed_zero_maps_to_one(self):
        # PG setseed(0) -> srandom(0); glibc treats seed 0 as 1
        a = PgRandom()
        a.setseed(0.0)
        b = PgRandom(seed=1)
        assert [a.random() for _ in range(3)] == [b.random() for _ in range(3)]

    def test_drandom_range(self):
        r = PgRandom(seed=1)
        vals = [r.drandom() for _ in range(1000)]
        assert all(0.0 <= v < 1.0 for v in vals)
        assert 0.4 < sum(vals) / len(vals) < 0.6


class TestCrc32:
    def test_known_value(self):
        # standard CRC-32 ("123456789") = 0xCBF43926
        assert pg_crc32(b"123456789") == 0xCBF43926

    def test_empty(self):
        assert pg_crc32(b"") == 0


class TestCsvLoader:
    def test_basic(self):
        text = b"1,2.5\n2,\n,3.5\n4,4.25\n"
        (di, vi), (df, vf) = load_csv(text, ["i", "f"])
        assert list(di[vi]) == [1, 2, 4]
        assert list(vi) == [True, True, False, True]
        assert list(df[vf]) == [2.5, 3.5, 4.25]

    def test_parallel_matches_serial(self):
        rng = np.random.default_rng(0)
        n = 20000
        rows = []
        for i in range(n):
            a = str(i) if rng.random() > 0.1 else ""
            b = repr(float(rng.random())) if rng.random() > 0.1 else ""
            rows.append(f"{a},{b}")
        text = ("\n".join(rows) + "\n").encode()
        serial = load_csv(text, ["i", "f"])
        pool = Pool(4)
        par = load_csv(text, ["i", "f"], pool=pool)
        for (ds, vs), (dp, vp) in zip(serial, par):
            assert (vs == vp).all()
            assert (ds[vs] == dp[vp]).all()

    def test_skip_column(self):
        text = b"1,ignored,2.5\n"
        cols = load_csv(text, ["i", "x", "f"])
        assert cols[1] == (None, None)
        assert cols[0][0][0] == 1 and cols[2][0][0] == 2.5


class TestSlabTier:
    """Slab classes over buddy blocks (shmem.c:94-100, 359-410 analog)."""

    def test_alloc_free_and_stats(self):
        from pg_strom_tpu.native import Arena
        a = Arena(1 << 22)
        ptrs = [a.slab_alloc(sz) for sz in (10, 96, 200, 500, 1000, 2500)]
        assert len(set(ptrs)) == len(ptrs)
        st = a.slab_stats()
        assert [r["size"] for r in st] == [96, 240, 512, 1184, 2520]
        assert sum(r["n_alloc"] for r in st) == 6
        for p in ptrs:
            a.slab_free(p)
        st = a.slab_stats()
        assert sum(r["n_free"] for r in st) == 6

    def test_double_free_detected(self):
        from pg_strom_tpu.native import Arena
        a = Arena(1 << 22)
        p = a.slab_alloc(64)
        a.slab_free(p)
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="double free"):
            a.slab_free(p)

    def test_redzone_overwrite_detected(self):
        import ctypes
        from pg_strom_tpu.native import Arena
        a = Arena(1 << 22)
        p = a.slab_alloc(96)
        # scribble past the 96-byte class payload
        ctypes.memset(p, 0xAB, 100)
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="redzone"):
            a.slab_free(p)

    def test_oversize_spills_to_buddy(self):
        from pg_strom_tpu.native import Arena
        a = Arena(1 << 22)
        p = a.slab_alloc(10_000)        # beyond the largest class
        a.slab_free(p)                  # routed back through the buddy tier

    def test_chunk_planes_ride_arena(self):
        # query-time data path: padded chunk planes allocate from the
        # tracked arena (visible in pgstrom_arena_info / slab stats)
        from pg_strom_tpu.native import data_arena
        from pg_strom_tpu.datastore import Table, Chunk, column_from_values
        from pg_strom_tpu import T
        a = data_arena()
        before = a.stats()["n_alloc"] + sum(r["n_alloc"]
                                            for r in a.slab_stats())
        t = Table.from_columns("t", {
            "x": column_from_values(T.INT4, list(range(100)))})
        ch = Chunk.from_table(t, 0, 100, 128)
        after = a.stats()["n_alloc"] + sum(r["n_alloc"]
                                           for r in a.slab_stats())
        assert after > before
        assert int(ch.columns["x"].data[:100].sum()) == sum(range(100))
