"""Profiling harness (SURVEY.md §5 "Tracing / profiling").

`Timer` wraps wall-clock phases; `benchmark_fn` times a jitted function
with proper warmup and `block_until_ready`, and `trace` wraps
jax.profiler.trace for Perfetto dumps."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax


class Timer:
    def __init__(self):
        self.laps = {}

    @contextlib.contextmanager
    def lap(self, name: str):
        t0 = time.perf_counter()
        yield
        self.laps[name] = self.laps.get(name, 0.0) + time.perf_counter() - t0


def benchmark_fn(
    fn: Callable, *args, warmup: int = 2, iters: int = 10
) -> Tuple[float, object]:
    """Return (seconds_per_call, last_result) with device sync."""
    result = None
    for _ in range(warmup):
        result = fn(*args)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args)
    jax.block_until_ready(result)
    return (time.perf_counter() - t0) / iters, result


def benchmark_fn_chained(
    fn: Callable,
    x,
    *rest,
    iters_low: int = 2,
    iters_high: int = 10,
    repeats: int = 3,
) -> float:
    """Seconds per call of fn(x, *rest), robust to async/remote runtimes.

    Some runtimes (e.g. the axon TPU relay on this box) return from
    block_until_ready before the device has actually executed, making naive
    wall-clock timing meaningless.  This harness jits a fori_loop running
    `fn` K times with a data dependency between iterations, returns a
    scalar, and forces a host readback; the per-call time is the slope
    between two loop lengths, which cancels RPC and readback overhead.

    Each chain length is timed `repeats` times and the MINIMUM is used
    (VERDICT r4 #1: one sample per length let a single slow chain — relay
    hiccup, host GC — land directly in the slope and move the headline
    number by >8%).  Min-of-N is the standard microbenchmark estimator for
    the noise model here: noise is strictly additive (RPC stalls, chip
    re-clocking), so the minimum is the best estimate of true cost.
    """
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    # ONE compiled program (full-model compiles take minutes through the
    # remote-TPU tunnel): a static-length fori_loop mapping x -> x-like,
    # chained at the Python level via async dispatch.  Timing 1 chained
    # call vs `iters_low + 1` cancels RPC + readback in the slope.
    iters = max(2, iters_high)

    @jax.jit
    def loop(x, rest):
        def body(_, carry):
            out = fn(carry, *rest)
            # Data dependency that cannot be folded away but leaves the
            # input numerically unchanged at f32/bf16 precision.  Reduce in
            # f32 and cast the probe to the carry dtype so mixed-dtype
            # stages (bf16 carry, f32 output or vice versa) keep the
            # fori_loop carry type stable.
            probe = jnp.asarray(0.0, jnp.float32)
            for leaf in jax.tree_util.tree_leaves(out):
                probe = probe + jnp.mean(leaf).astype(jnp.float32)
            return carry + (1e-30 * probe).astype(carry.dtype)

        return lax.fori_loop(0, iters, body, x)

    readback = jax.jit(jnp.sum)

    def run_chain(n):
        y = x
        for _ in range(n):
            y = loop(y, rest)
        return float(np.asarray(readback(y)))

    run_chain(1)  # compile + warm up
    times = {}
    for n in (1, 1 + iters_low):
        best = float("inf")
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            run_chain(n)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max(
        (times[1 + iters_low] - times[1]) / (iters_low * iters), 1e-9
    )


def drift_probe_ms(repeats: int = 3) -> float:
    """Time a pinned fixed-shape matmul chain; returns ms per probe call.

    A constant-work kernel run alongside the real benchmark quantifies
    chip-state drift (thermal/clock/relay load) between sessions: if two
    runs disagree on the model latency but agree on the probe, the model
    changed; if both moved together, the chip state did (VERDICT r4 #1a).
    Shape (2048x2048 bf16 matmul x 128) is ~2.2 TFLOP per probe call
    (~11 ms on a v5e) — the timed slope spans >200 ms, well above the
    relay's ~10 ms jitter (an earlier 17-GFLOP probe measured as zero).
    """
    import jax.numpy as jnp
    from jax import lax

    a = jnp.full((2048, 2048), 0.5, jnp.bfloat16)

    def step(_, y):
        out = lax.dot_general(
            y, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Renormalize so the carry stays finite across iterations.
        return (out / jnp.maximum(jnp.max(jnp.abs(out)), 1.0)).astype(
            jnp.bfloat16
        )

    def chain(y):
        return lax.fori_loop(0, 128, step, y)

    return benchmark_fn_chained(chain, a, repeats=repeats) * 1e3


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a Perfetto/XPlane trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
