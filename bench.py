"""Benchmark: multiHMR end-to-end latency/throughput on one TPU chip.

Default: measures the flagship (multiHMR_896_L, single image) and prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 126 ms/img on V100-32GB (reference README.md:87,95; BASELINE.md).
``vs_baseline`` is the speedup factor (baseline_ms / our_ms, >1 = faster).

``--sweep``: additionally measures 672_S/B/L latency, batch-8 672_B
throughput, and 1288_L, and writes ``BENCH_SWEEP.json`` next to this file —
the driver-collectable evidence for the README performance table.

Methodology: the axon tunnel adds ~25 ms of host↔device round-trip latency,
so latency is measured by the TWO-LENGTH SLOPE (utils/profiling.py): one jit
program chains n dependent forwards (a dynamic-trip-count fori_loop — ONE
compile serves every n), timed at n=ITERS and n=2·ITERS back-to-back;
per-image latency = (t_long − t_short)/ITERS, so the round-trip constant
cancels EXACTLY. The previous subtract-a-measured-nop method under-reported
models whose whole chain fits inside one tunnel round-trip (672_S read
0.52 ms vs the true 2.6 ms); the slope method is immune. The median of
REPEATS slope pairs is reported.
"""

import json
import os
import sys

import jax

from multihmr_tpu.utils.cache import enable_persistent_cache

# Persistent compilation cache: the flagship program is large and the remote
# TPU compile is slow — cache hits make reruns start in seconds. Keyed by the
# libtpu build so stale AOT entries are never loaded after an upgrade.
enable_persistent_cache()  # repo-root .jax_cache

import jax.numpy as jnp

from multihmr_tpu.factory import build_model
from multihmr_tpu.utils.precision import cast_backbone_bf16
from multihmr_tpu.utils.profiling import latency_stats

BASELINE_MS = 126.0  # multiHMR_896_L on V100 (reference README.md:87)
ITERS = 8
REPEATS = 7


def measure_model(name: str, batch: int = 1, on_provisional=None) -> float:
    """p50 per-image latency (ms) of ``name`` at the given batch size,
    measured by the two-length slope (see module docstring).

    ``on_provisional(ms)``: called with a first estimate after only 3
    measured slope pairs — the driver-timeout hardening hook: main() prints
    a parseable JSON line the moment it fires, so even a run killed
    mid-bench leaves the flagship number in the output tail.
    """
    model, _ = build_model(name)
    cfg = model.cfg
    # NOTE: params must be a jit ARGUMENT — closing over them would inline
    # ~1.2 GB of constants into the program and blow up compile time.
    # bf16 weight storage kills the per-call fp32→bf16 converts.
    params = cast_backbone_bf16(model.init_params(jax.random.PRNGKey(0)))

    S = cfg.img_size
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, S, S, 3), jnp.float32)
    K = jnp.broadcast_to(
        jnp.asarray(
            [[754.0, 0, S / 2], [0, 754.0, S / 2], [0, 0, 1.0]], jnp.float32
        ),
        (batch, 3, 3),
    )

    def fwd(params, x):
        return model.forward(params, x, K, det_thresh=0.3, nms_kernel_size=3)

    # latency_stats = the ONE timing harness in this repo (CLAUDE.md rule 5):
    # dynamic-trip-count chained fori_loop, two-length slope, data-dependent
    # iterations; on_pair is the provisional-emit hook
    on_pair = None
    if on_provisional is not None:
        on_pair = lambda ms: on_provisional(ms / batch)
    st = latency_stats(fwd, (params, x), iters=ITERS, repeats=REPEATS,
                       on_pair=on_pair)
    return st["p50_ms"] / batch


def emit_flagship(p50: float) -> None:
    print(
        json.dumps(
            {
                "metric": "p50_ms_per_image_multiHMR_896_L_e2e",
                "value": round(p50, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / p50, 2),
            }
        ),
        flush=True,
    )


def main():
    sweep = "--sweep" in sys.argv
    # the provisional emit (3 repeats in) makes a driver-timeout run still
    # leave a parseable line; the final line supersedes it when we get there.
    # One retry: the remote compile service occasionally drops a connection
    # mid-compile ("response body closed") — transient, observed ~1/10 runs.
    try:
        p50 = measure_model("multiHMR_896_L", on_provisional=emit_flagship)
    except Exception as e:  # pragma: no cover - remote-compile flake
        print(f"# flagship attempt 1 failed ({e}); retrying", file=sys.stderr)
        p50 = measure_model("multiHMR_896_L", on_provisional=emit_flagship)
    emit_flagship(p50)
    if not sweep:
        return
    # Reference V100 numbers (reference README.md:85-95): 896_L 126 ms,
    # 672_L 74 ms, 672_B 43 ms, 672_S 29 ms. No reference number for
    # 1288_L (leaderboard-only config, runtime "?") or batched throughput.
    ref = {"multiHMR_896_L": 126.0, "multiHMR_672_L": 74.0,
           "multiHMR_672_B": 43.0, "multiHMR_672_S": 29.0}
    results = {"multiHMR_896_L": {"p50_ms": round(p50, 3),
                                  "vs_baseline": round(ref["multiHMR_896_L"] / p50, 2)}}
    for name in ("multiHMR_672_S", "multiHMR_672_B", "multiHMR_672_L",
                 "multiHMR_1288_L_bedlam", "multiHMR_672_L_anny"):
        try:
            ms = measure_model(name)
        except Exception as e:  # pragma: no cover - remote-compile flake
            print(f"# {name} FAILED: {e}", file=sys.stderr)
            results[name] = {"error": str(e)}
            continue
        entry = {"p50_ms": round(ms, 3)}
        if name in ref:
            entry["vs_baseline"] = round(ref[name] / ms, 2)
        results[name] = entry
        print(f"# {name}: {ms:.2f} ms", file=sys.stderr)
    for key, name, batch in (
        ("multiHMR_672_B_batch8", "multiHMR_672_B", 8),
        ("multiHMR_896_L_batch4", "multiHMR_896_L", 4),
    ):
        try:
            msb = measure_model(name, batch=batch)
        except Exception as e:  # pragma: no cover - remote-compile flake
            print(f"# {key} FAILED: {e}", file=sys.stderr)
            results[key] = {"error": str(e)}
            continue
        results[key] = {
            "p50_ms_per_image": round(msb, 3),
            "throughput_img_s": round(1000.0 / msb, 1),
        }
        print(f"# {key}: {msb:.2f} ms/img", file=sys.stderr)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_SWEEP.json")
    # Merge-preserve: entries measured by OTHER tools (serve_*, eval_sweep_*,
    # bf16_sensitivity, k_capacity, ...) live in the same file; a model-sweep
    # re-run must refresh the model rows without dropping them (round-4's
    # README/SWEEP inconsistency came from exactly this overwrite).
    if os.path.exists(out):
        try:
            with open(out) as f:
                prior = json.load(f).get("results", {})
            for k, v in prior.items():
                results.setdefault(k, v)
        except (json.JSONDecodeError, OSError):
            pass
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind,
                   "method": "two-length-slope",
                   "iters": ITERS, "repeats": REPEATS,
                   "results": results}, f, indent=1)
    print(f"# sweep written to {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
