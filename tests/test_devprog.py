"""Async device-program builds (utils/devprog.py — the opencl_devprog.c
build-waitq analog): background builds, parking windows, fallback tier."""

import threading
import time

import pg_strom_tpu  # noqa: F401
from pg_strom_tpu.config import override
from pg_strom_tpu.utils.devprog import ProgramBuilder, tiered_capacity


def test_ensure_builds_once_and_ready():
    b = ProgramBuilder()
    calls = []

    def thunk():
        calls.append(1)
        return "compiled"

    b.ensure("k1", thunk)
    b.ensure("k1", thunk)           # second ensure must not rebuild
    assert b.wait("k1", 5.0)
    assert b.ready("k1")
    assert len(calls) == 1
    assert b.failed("k1") is None


def test_parking_window_times_out_on_slow_build():
    b = ProgramBuilder()
    gate = threading.Event()

    def slow():
        gate.wait(10.0)
        return "done"

    b.ensure("slow", slow)
    t0 = time.monotonic()
    assert not b.wait("slow", 0.05)         # parked, then gave up
    assert time.monotonic() - t0 < 2.0
    assert not b.ready("slow")
    gate.set()
    assert b.wait("slow", 5.0)


def test_failed_build_is_surfaced_not_raised():
    b = ProgramBuilder()

    def boom():
        raise RuntimeError("compiler exploded")

    b.ensure("bad", boom)
    assert not b.wait("bad", 5.0)
    assert not b.ready("bad")
    assert isinstance(b.failed("bad"), RuntimeError)
    rows = b.info_rows()
    assert any(r["state"] == "error" for r in rows)


def test_tiered_capacity_cpu_passthrough():
    # CPU backend: compiles are cheap; the tier must not engage
    with override(devprog_async_build=True, chunk_rows_cold=1 << 10):
        assert tiered_capacity(1 << 20, ("k",), None, ()) == 1 << 20


def test_tiered_capacity_small_cap_passthrough():
    with override(chunk_rows_cold=1 << 24):
        assert tiered_capacity(1 << 20, ("k",), None, ()) == 1 << 20
