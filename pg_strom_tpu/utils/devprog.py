"""Device program cache + asynchronous builds — the opencl_devprog.c analog.

The reference keeps a shared CRC-keyed cache of built cl_programs and builds
them ASYNCHRONOUSLY: a message that needs a program still being built is
parked on the entry's waitq and re-enqueued by the clBuildProgram callback
(reference /root/reference/opencl_devprog.c:128-250, 270-569) — queries never
stall for the compiler.  XLA's jit replaces the cache itself, but not the
async discipline: the engine's 2^26-row flagship program costs minutes to
compile cold (BENCH_r02: 704s), and a synchronous first-touch compile stalls
the query for all of it.

This module restores the reference behavior with two TPU-native mechanisms:

1. **Persistent compilation cache** (the on-disk analog of the reference's
   shared devprog_entry hash): `init_compilation_cache()` points JAX's
   persistent cache at `config.devprog_cache_dir` so a program is compiled
   once per machine, ever.  Measured through the axon tunnel: a 172s cold
   compile deserializes in 1.3s from the disk cache in a fresh process.

2. **Async AOT builds with parking** (the build-waitq analog): `ensure()`
   submits `jit(fn).lower(shapes).compile()` on a daemon thread — measured:
   a background AOT compile runs server-side while the main thread keeps
   executing other programs at ~27ms/call — and `wait()` parks the caller
   for at most `config.devprog_build_wait_ms`.  An executor whose big-chunk
   program is not ready within the parking window runs THIS query at the
   small fallback tier (`config.chunk_rows_cold`, the round-1 2^24 shape
   whose compile is ~10s cold / ~1s from disk) while the big program builds
   behind it; later queries switch to the big tier when `ready()`.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Any, Callable

from ..config import config

_lock = threading.Lock()
_cache_initialized = False


def init_compilation_cache() -> str | None:
    """Ensure JAX's persistent compilation cache points at the engine cache
    dir (package import normally already did; this covers config overrides).

    Idempotent; returns the directory in use (None when disabled).  Safe to
    call before any compile — JAX reads the setting lazily per compilation.
    """
    global _cache_initialized
    with _lock:
        import jax
        cur = jax.config.jax_compilation_cache_dir
        if not config.devprog_enable_disk_cache:
            return cur           # package-level env knob stays authoritative
        if cur:
            _cache_initialized = True
            return cur
        plats = (jax.config.jax_platforms or "").split(",")
        if (plats[0] or "tpu") == "cpu":
            return None          # cpu-primary (test suite): cache off
        d = config.devprog_cache_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "pg_strom_tpu", "xla")
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _cache_initialized = True
        return d


class _Build:
    __slots__ = ("event", "error", "started", "finished", "compiled")

    def __init__(self) -> None:
        self.event = threading.Event()
        self.error: BaseException | None = None
        self.started = time.monotonic()
        self.finished: float | None = None
        self.compiled: Any = None


class ProgramBuilder:
    """Background AOT program builder with parking (build-waitq analog)."""

    def __init__(self) -> None:
        self._builds: dict[Any, _Build] = {}
        self._mu = threading.Lock()

    def ensure(self, key: Any, build_thunk: Callable[[], Any]) -> None:
        """Schedule build_thunk (typically fn.lower(shapes).compile()) on a
        daemon thread unless a build for `key` already ran or is running."""
        with self._mu:
            if key in self._builds:
                return
            b = _Build()
            self._builds[key] = b
        init_compilation_cache()

        def run() -> None:
            try:
                b.compiled = build_thunk()
            except BaseException as e:   # noqa: BLE001 — recorded, surfaced
                b.error = e
            finally:
                b.finished = time.monotonic()
                b.event.set()

        threading.Thread(target=run, daemon=True,
                         name=f"pgstrom-devprog-{abs(hash(key)) & 0xffff:04x}"
                         ).start()

    def ready(self, key: Any) -> bool:
        b = self._builds.get(key)
        return b is not None and b.event.is_set() and b.error is None

    def failed(self, key: Any) -> BaseException | None:
        b = self._builds.get(key)
        return b.error if b is not None and b.event.is_set() else None

    def wait(self, key: Any, timeout_s: float) -> bool:
        """Park on the build for at most timeout_s; True when it completed
        successfully (the caller may then use the big-tier program)."""
        b = self._builds.get(key)
        if b is None:
            return False
        b.event.wait(timeout_s)
        return b.event.is_set() and b.error is None

    def info_rows(self) -> list[dict]:
        """pgstrom_program_info analog (reference opencl_devprog.c:770)."""
        rows = []
        with self._mu:
            items = list(self._builds.items())
        for k, b in items:
            rows.append({
                "key": repr(k)[:120],
                "state": ("error" if b.error is not None
                          else "built" if b.event.is_set() else "building"),
                "build_s": round(((b.finished or time.monotonic())
                                  - b.started), 2),
                "error": (repr(b.error)[:120] if b.error is not None
                          else None),
            })
        return rows


DEVPROG = ProgramBuilder()


def tiered_capacity(cap: int, plan_key: Any, fn: Any,
                    shape_args: tuple, pm=None) -> int:
    """Pick the chunk capacity for this query: `cap` when its program is
    (or becomes, within the parking window) compiled; otherwise schedule the
    big build in the background and return the small fallback tier.

    `fn` must be the jax.jit-wrapped program; `shape_args` the
    ShapeDtypeStruct pytree matching a `cap`-sized call.  Mirrors
    clserv_lookup_device_program's park-or-fallback (opencl_devprog.c:270).
    """
    small = int(config.chunk_rows_cold)
    if cap <= small or not config.devprog_async_build:
        return cap
    import jax
    if jax.default_backend() == "cpu":
        return cap               # CPU tests: compiles are cheap, keep shapes
    key = (plan_key, cap)
    if DEVPROG.ready(key):
        return cap
    if DEVPROG.failed(key) is not None:
        return cap               # build errored: let the sync path raise it
    DEVPROG.ensure(key, lambda: fn.lower(*shape_args).compile())
    if DEVPROG.wait(key, max(config.devprog_build_wait_ms, 0) / 1000.0):
        return cap
    if pm is not None:
        pm.bump("devprog_tier_fallbacks")
    return small
