"""Profiling / timing harness.

First-class replacement for the reference's ad-hoc cProfile dump
(experiments/franka_panda/03_self_avoidance.py:46-49): explicit compile-vs-run
timing of jitted callables and jax.profiler trace capture for TPU timelines.
"""
from __future__ import annotations

import contextlib
import time

import jax


def block(tree):
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree


def time_jitted(fn, *args, iters: int = 10, warmup: int = 2):
    """(compile_seconds, per_call_seconds) for a jitted callable."""
    t0 = time.perf_counter()
    block(fn(*args))
    compile_s = time.perf_counter() - t0
    for _ in range(max(0, warmup - 1)):
        block(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    block(out)
    return compile_s, (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rmp_tpu_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
