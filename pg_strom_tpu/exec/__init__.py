"""Execution layer: chunked streaming executor with async in-flight window,
host-exact replay (CpuReCheck analog), and per-query jit caching.

Replaces the reference's backend/executor plumbing: the async chunk window
(gpuscan.c:1065-1163, min/max_async_chunks GUCs), the message queue round-trip
(mqueue.c), and the CPU fallback paths (gpupreagg.c:2507-2608).
"""
