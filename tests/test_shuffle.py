"""Distributed shuffle join+agg tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import pg_strom_tpu  # noqa: F401
import jax

from pg_strom_tpu.parallel.mesh import get_mesh
from pg_strom_tpu.parallel.shuffle import (
    build_shuffle_join_agg_step, host_merge_group_partials,
)


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    """The big 8-device shard_map programs segfault the XLA CPU compiler when
    compiled after the ~1000 single-device programs the rest of the suite
    accumulates (latent jaxlib bug — crash is inside backend_compile).
    Dropping the jit caches first avoids the state buildup and keeps the
    shuffle tests hermetic."""
    jax.clear_caches()
    yield


def reference_join_agg(pk, pv, pvalid, bk, bp, bvalid):
    """Plain python: SUM(pv * bp) grouped by key over the inner join."""
    from collections import defaultdict
    build = defaultdict(list)
    for k, p, ok in zip(bk, bp, bvalid):
        if ok:
            build[int(k)].append(int(p))
    out = {}
    for k, v, ok in zip(pk, pv, pvalid):
        if not ok:
            continue
        for pay in build.get(int(k), ()):
            c, s = out.get(int(k), (0, 0.0))
            out[int(k)] = (c + 1, s + float(v) * pay)
    return out


@pytest.mark.parametrize("ndev", [2, 8])
def test_shuffle_join_agg_matches_reference(ndev):
    mesh = get_mesh(ndev)
    rng = np.random.default_rng(42)
    NP_, NB = 64 * ndev, 32 * ndev
    pk = rng.integers(0, 40, NP_).astype(np.int64)
    pv = rng.random(NP_).astype(np.float64)
    pvalid = rng.random(NP_) > 0.1
    bk = rng.integers(0, 40, NB).astype(np.int64)
    bp = rng.integers(1, 10, NB).astype(np.int64)
    bvalid = rng.random(NB) > 0.1

    step = build_shuffle_join_agg_step(mesh, bucket_cap=256, nbuckets=256,
                                       max_chain=16, G=128)
    fk, fv, fcnt, fsum, ovf = step(pk, pv, pvalid, bk, bp, bvalid)
    assert not bool(np.asarray(ovf).any())
    got = host_merge_group_partials(fk, fv, fcnt, fsum)
    want = reference_join_agg(pk, pv, pvalid, bk, bp, bvalid)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], f"count mismatch for key {k}"
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-12)


def test_each_group_on_one_device():
    """After the re-aggregation shuffle, no group straddles devices."""
    mesh = get_mesh(4)
    rng = np.random.default_rng(1)
    NP_, NB = 256, 128
    pk = rng.integers(0, 16, NP_).astype(np.int64)
    pv = np.ones(NP_, dtype=np.float64)
    bk = np.arange(NB).astype(np.int64) % 16
    bp = np.ones(NB, dtype=np.int64)
    step = build_shuffle_join_agg_step(mesh, bucket_cap=512, nbuckets=128,
                                       max_chain=16, G=64)
    fk, fv, fcnt, fsum, ovf = step(pk, pv, np.ones(NP_, bool),
                                   bk, bp, np.ones(NB, bool))
    fk, fv = np.asarray(fk), np.asarray(fv)
    G = 64
    seen = {}
    for d in range(4):
        for k, v in zip(fk[d * G:(d + 1) * G], fv[d * G:(d + 1) * G]):
            if v:
                assert int(k) not in seen, f"group {k} on devices {seen[int(k)]} and {d}"
                seen[int(k)] = d
    assert len(seen) == 16


def test_bucket_overflow_flagged():
    mesh = get_mesh(2)
    N = 512
    pk = np.zeros(N, dtype=np.int64)  # all rows to one partition
    step = build_shuffle_join_agg_step(mesh, bucket_cap=8, nbuckets=64,
                                       max_chain=4, G=32)
    *_, ovf = step(pk, np.ones(N), np.ones(N, bool),
                   pk[:64], np.ones(64, dtype=np.int64), np.ones(64, bool))
    assert bool(np.asarray(ovf).any())


def test_skew_routing_avoids_overflow_and_matches_reference():
    """90% of probe rows share one key: plain hash partitioning overflows
    the per-device buckets, the skew router (spread + broadcast) does not,
    and results stay exact."""
    from pg_strom_tpu.parallel.shuffle import detect_heavy_keys

    mesh = get_mesh(4)
    rng = np.random.default_rng(5)
    NP_, NB = 128 * 4, 16 * 4
    pk = np.where(rng.random(NP_) < 0.9, 7, rng.integers(0, 40, NP_)).astype(np.int64)
    pv = rng.random(NP_)
    pvalid = np.ones(NP_, bool)
    bk = np.arange(NB).astype(np.int64) % 40
    bp = rng.integers(1, 5, NB).astype(np.int64)
    bvalid = np.ones(NB, bool)

    # plain hash partitioning: the hot key funnels ~460 rows to one device
    plain = build_shuffle_join_agg_step(mesh, bucket_cap=96, nbuckets=128,
                                        max_chain=8, G=64)
    *_, ovf = plain(pk, pv, pvalid, bk, bp, bvalid)
    assert bool(np.asarray(ovf).any()), "expected plain partitioning to overflow"

    heavy = detect_heavy_keys(pk, pvalid, k_heavy=2, sample_rows=256,
                              threshold=0.10)
    assert 7 in heavy.tolist()
    skew = build_shuffle_join_agg_step(mesh, bucket_cap=96, nbuckets=128,
                                       max_chain=8, G=64, k_heavy=2)
    fk, fv, fcnt, fsum, ovf = skew(pk, pv, pvalid, bk, bp, bvalid, heavy)
    assert not bool(np.asarray(ovf).any()), "skew router should not overflow"
    got = host_merge_group_partials(fk, fv, fcnt, fsum)
    want = reference_join_agg(pk, pv, pvalid, bk, bp, bvalid)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], f"count mismatch for key {k}"
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-12)


def test_skew_detect_empty_and_uniform():
    from pg_strom_tpu.parallel.shuffle import detect_heavy_keys, _HEAVY_SENTINEL
    out = detect_heavy_keys(np.array([], dtype=np.int64),
                            np.array([], dtype=bool), 4)
    assert (out == _HEAVY_SENTINEL).all()
    keys = np.arange(1000, dtype=np.int64)  # uniform: nothing is heavy
    out = detect_heavy_keys(keys, np.ones(1000, bool), 4, sample_rows=512,
                            threshold=0.05)
    assert (out == _HEAVY_SENTINEL).all()
