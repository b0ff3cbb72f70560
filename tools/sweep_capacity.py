"""Detection-capacity ablation: what does raising K (max_people) cost?

The reference handles an arbitrary person count P through dynamic shapes
(reference model.py:149 ``torch.where``); the TPU redesign uses static
``[B, K]`` slots and truncates beyond K with a warning
(models/multihmr.py::extract_persons). That trade-off needs a price tag
(VERDICT r4 #7): this sweeps K ∈ {16, 32, 64} per config and reports
compile wall + steady-state ms/img, so users can size K for crowded scenes
instead of guessing.

Usage:
  python tools/sweep_capacity.py [--configs multiHMR_672_B,multiHMR_896_L]
      [--capacities 16,32,64] [--no-merge]

Merges a ``k_capacity`` block into BENCH_SWEEP.json unless --no-merge.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_point(name: str, capacity: int) -> dict:
    import jax
    import jax.numpy as jnp

    from multihmr_tpu.config import named_config
    from multihmr_tpu.factory import smplx_like_synthetic
    from multihmr_tpu.models.multihmr import MultiHMR
    from multihmr_tpu.utils.precision import cast_backbone_bf16
    from multihmr_tpu.utils.profiling import latency_stats

    cfg = dataclasses.replace(named_config(name), max_people=capacity)
    bm = smplx_like_synthetic(cfg.num_betas)
    model = MultiHMR(cfg, bm)
    params = cast_backbone_bf16(model.init_params(jax.random.PRNGKey(0)))
    jax.block_until_ready(params)

    S = cfg.img_size
    x = jax.random.normal(jax.random.PRNGKey(1), (1, S, S, 3), jnp.float32)
    f = (S / 2.0) / np.tan(np.radians(60.0) / 2.0)
    K = jnp.asarray([[[f, 0, S / 2], [0, f, S / 2], [0, 0, 1.0]]], jnp.float32)

    fwd = jax.jit(lambda p, x: model.forward(p, x, K))
    t0 = time.perf_counter()
    jax.block_until_ready(fwd(params, x))
    compile_s = time.perf_counter() - t0  # first call: trace+compile+run

    r = latency_stats(lambda p, x: model.forward(p, x, K), (params, x), iters=8)
    return {
        "capacity": capacity,
        "ms_per_img": round(r["p50_ms"], 2),
        "compile_s": round(compile_s, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="multiHMR_672_B,multiHMR_896_L")
    p.add_argument("--capacities", default="16,32,64")
    p.add_argument("--no-merge", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from multihmr_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    results = {}
    for name in args.configs.split(","):
        name = name.strip()
        results[name] = []
        for cap in (int(c) for c in args.capacities.split(",")):
            r = run_point(name, cap)
            results[name].append(r)
            print(json.dumps({"config": name, **r}), flush=True)

    if not args.no_merge:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_SWEEP.json")
        with open(path) as f:
            sweep = json.load(f)
        sweep["results"]["k_capacity"] = results
        with open(path, "w") as f:
            json.dump(sweep, f, indent=1)
        print(f"# merged into {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
