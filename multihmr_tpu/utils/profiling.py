"""Profiling and timing utilities.

The reference instruments with bare ``time.time()`` spans and per-image
prints (reference demo.py:333-338, train.py:190-234). TPU-native equivalents:

  * :class:`Timer` — ``block_until_ready``-bracketed wall-clock spans with
    p50/p90 summaries (device-async-safe, unlike naive time.time around
    dispatch);
  * :func:`profile_trace` — context manager around ``jax.profiler`` emitting
    a TensorBoard-loadable trace (XLA op-level timeline, HBM usage);
  * :func:`latency_stats` — amortized latency measurement that chains N
    iterations inside one jit program, the correct way to time sub-ms
    kernels when host↔device round-trips cost more than the kernel.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Dict, List

import numpy as np

import jax
import jax.numpy as jnp


class Timer:
    def __init__(self, name: str = "timer"):
        self.name = name
        self.spans: List[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.spans.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        arr = np.asarray(self.spans)
        if arr.size == 0:
            return {}
        return {
            "n": int(arr.size),
            "p50_ms": float(1e3 * np.median(arr)),
            "p90_ms": float(1e3 * np.percentile(arr, 90)),
            "mean_ms": float(1e3 * arr.mean()),
        }

    def __str__(self):
        s = self.summary()
        return f"{self.name}: " + ", ".join(f"{k}={v:.3g}" for k, v in s.items())


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/jax_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_op_table(logdir: str, top: int = 25, runs: int = 1):
    """Parse the newest jax.profiler trace under ``logdir`` into a per-op
    device-time table: list of (name, total_ms_per_run, count_per_run),
    sorted by time. The workhorse behind ``tools/profile_model.py --ops`` —
    the same analysis that located the round-2 wins (layout-transform
    fusions, per-call fp32→bf16 weight converts, erf-GELU cost).

    ``runs``: how many profiled executions the trace contains (totals are
    divided by it). Device events are those whose trace process is a TPU;
    on CPU backends (tests) all complete-events are counted instead.
    """
    import glob
    import gzip
    import json
    from collections import Counter

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in pids.items() if "TPU" in n or "tpu" in n}
    durs: Counter = Counter()
    counts: Counter = Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        durs[e["name"]] += e.get("dur", 0)
        counts[e["name"]] += 1
    return [
        (name, d / runs / 1e3, counts[name] // max(runs, 1))
        for name, d in durs.most_common(top)
    ]


def latency_stats(
    fn: Callable, args: tuple, iters: int = 8, repeats: int = 5,
    on_pair: Callable = None,
) -> Dict[str, float]:
    """Amortized per-call latency of ``fn(*args)`` (a jax-traceable function
    returning a pytree): chains n dependent calls inside one jit program
    with a DYNAMIC trip count (``fori_loop``, so ONE compile serves every
    n), timed at n=iters and n=2·iters back-to-back; per-call latency is
    the slope (t_long − t_short)/iters — the host round-trip constant
    (~25 ms through the TPU tunnel) cancels exactly, which matters for any
    call whose whole chain fits inside one round-trip.

    IMPORTANT:
      * pass model parameters inside ``args`` — a closure over a large param
        tree inlines it as constants into the program and makes compilation
        pathological (gigabytes of literals for ViT-L);
      * iterations are made data-DEPENDENT (each call's input is perturbed by
        the running output sum) so XLA cannot hoist the loop-invariant body
        and compute it once — without this the reported latency is iters×
        too small.

    ``on_pair(p50_ms_so_far)``: called after the 3rd slope pair — lets a
    caller emit a provisional number before all repeats finish (bench.py's
    driver-timeout hardening)."""
    # perturb the last float-dtype array argument with the running feedback
    perturb_idx = max(
        i for i, a in enumerate(args)
        if hasattr(a, "dtype") and jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
    )

    @jax.jit
    def chained(n, *args):
        def body(_, acc):
            cur = list(args)
            cur[perturb_idx] = cur[perturb_idx] + acc * 1e-12
            out = fn(*cur)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(
                jnp.sum(l.astype(jnp.float32)) for l in leaves
                if hasattr(l, "astype")
            )
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    for _ in range(2):  # compile + genuine warmup (first post-compile run
        _ = float(chained(2 * iters, *args))  # can pay one-off load costs)
    slopes = []
    for r in range(repeats):
        # short/long adjacent in time so tunnel drift cancels within a pair
        t0 = time.perf_counter()
        float(chained(iters, *args))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chained(2 * iters, *args))
        t_long = time.perf_counter() - t0
        slopes.append((t_long - t_short) / iters)
        if r == 2 and on_pair is not None:
            on_pair(float(1e3 * max(np.median(slopes), 1e-6)))
    # clamp: individual slopes can go <= 0 when tunnel-RTT noise dominates a
    # very short chain (672_S: 8 iters ≈ 21 ms, below one ~25 ms round
    # trip); a zero/negative p50 would poison downstream vs_baseline ratios
    return {
        "p50_ms": float(1e3 * max(np.median(slopes), 1e-6)),
        "min_ms": float(1e3 * max(min(slopes), 1e-6)),
        "iters": iters,
    }
