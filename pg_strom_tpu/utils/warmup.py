"""Background device warmup.

BASELINE.md truth #16: the FIRST device->host fetch in a fresh process
costs ~90-180 s of axon service/process initialization on the tunneled
TPU — regardless of program size, and entirely outside this engine's
control.  What the engine CAN control is overlap: kicking a trivial
fetch on a daemon thread at engine start makes the service init run
while tables load and statistics build, so the first user query pays
only the residual.

Reference frame: opencl_serv.c starts its bgworker at postmaster startup
(not at first query) for the same reason — device/runtime bring-up must
not serialize with the first request.

Idempotent and config-gated (pg_strom.warmup_async); never warms a CPU
backend (tests), and failures are silent — a broken tunnel will surface
on the real query with its own error.
"""

from __future__ import annotations

import threading

_LOCK = threading.Lock()
_STARTED = False


def ensure_warmup() -> None:
    """Start the one-shot background device warmup (no-op after the
    first call, on CPU backends, or when pg_strom.warmup_async is off)."""
    global _STARTED
    from ..config import config
    if _STARTED or not getattr(config, "warmup_async", True):
        return
    with _LOCK:
        if _STARTED:
            return
        _STARTED = True

    def run() -> None:
        try:
            import jax
            if jax.default_backend() == "cpu":
                return
            import numpy as np
            # one tiny jit + fetch: forces platform/client/service init
            # and a round trip through the compile cache
            jax.device_get(jax.jit(lambda v: v * 2)(
                np.ones(8, np.float32)))
        except Exception:       # noqa: BLE001 — warmup must never raise
            pass

    threading.Thread(target=run, daemon=True,
                     name="pg-strom-warmup").start()
