"""On-chip training smoke test at a chosen resolution.

Validates that a full train step (forward + loss + flash-attention Pallas
backward + optax update) compiles and executes on one TPU chip — the
acceptance check for large-resolution training memory (1288² = 8,465 ViT
tokens; the round-1 XLA attention backward materialized [N, N] fp32 and
could not fit this).

Usage:  python tools/train_smoke.py [--model multiHMR_1288_L_bedlam]
        [--batch 1] [--steps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="multiHMR_1288_L_bedlam")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument(
        "--remat_policy", default="mlp", choices=["block", "mlp", "none"],
        help="'mlp' (default): recompute only the fc1 hidden state — the "
        "backward never re-runs the flash-attention forward; 'block': full "
        "block remat (max memory savings); 'none': no remat",
    )
    ap.add_argument(
        "--json", action="store_true",
        help="append the steady-state step time to BENCH_TRAIN.json "
        "(driver-collectable training-perf artifact)",
    )
    ap.add_argument(
        "--ops", type=int, default=0, metavar="N",
        help="capture a jax.profiler trace of the steady-state train step "
        "and print the top-N ops by device time (the train-floor analysis "
        "input, BASELINE.md)",
    )
    ap.add_argument("--trace", default=None,
                    help="trace logdir (default /tmp/multihmr_train_trace)")
    args = ap.parse_args()

    import jax

    from multihmr_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # repo-root .jax_cache

    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    import optax

    from multihmr_tpu.config import named_config
    from multihmr_tpu.factory import smplx_like_synthetic
    from multihmr_tpu.models.multihmr import MultiHMR
    from multihmr_tpu.train.trainer import make_train_step

    cfg = dataclasses.replace(
        named_config(args.model),
        remat=args.remat_policy != "none",
        remat_policy=args.remat_policy if args.remat_policy != "none" else "block",
        max_people=8,
    )
    bm = smplx_like_synthetic(cfg.num_betas)
    model = MultiHMR(cfg, bm)
    print(f"{args.model}: img={cfg.img_size} grid={cfg.grid_size} "
          f"tokens={cfg.num_patches + 1} remat={cfg.remat} "
          f"policy={cfg.remat_policy if cfg.remat else '-'}")

    params = model.init_params(jax.random.PRNGKey(0), batch_size=1)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M")

    optimizer = optax.adam(5e-6)
    opt_state = jax.jit(optimizer.init)(params)
    step = make_train_step(model, optimizer, donate=True)

    B, Kh, S = args.batch, cfg.max_people, cfg.img_size
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, S, S, 3)), jnp.float32),
        "K": jnp.broadcast_to(
            jnp.asarray([[900.0, 0, S / 2], [0, 900.0, S / 2], [0, 0, 1]], jnp.float32),
            (B, 3, 3),
        ),
        "gt_pose": jnp.asarray(rng.normal(scale=0.2, size=(B, Kh, 53, 3)), jnp.float32),
        "gt_shape": jnp.asarray(rng.normal(size=(B, Kh, 10)), jnp.float32),
        "gt_transl": jnp.asarray(
            rng.normal(scale=0.3, size=(B, Kh, 3)) + np.array([0, 0, 4.0]), jnp.float32
        ),
        "gt_valid": jnp.asarray((rng.uniform(size=(B, Kh)) > 0.4), jnp.float32),
    }

    # Step 0 separately (compile); then run the remaining steps back-to-back
    # with ONE final sync so the ~25 ms host round-trip (CLAUDE.md timing
    # rule) is amortized across all timed steps instead of inflating each.
    # The steps chain device-side through params/opt_state, so nothing can
    # be elided; losses are fetched after the clock stops.
    t0 = time.time()
    params, opt_state, terms = step(params, opt_state, batch, 0)
    total = float(terms["total"])  # sync
    print(f"step 0: loss={total:.4f}  (incl. compile {time.time() - t0:.2f}s)")
    assert np.isfinite(total), "non-finite loss"

    all_terms = []
    n_timed = max(args.steps - 1, 0)
    t0 = time.time()
    for _ in range(n_timed):
        params, opt_state, terms = step(params, opt_state, batch, 0)
        all_terms.append(terms)
    jax.block_until_ready(params)
    per_step = (time.time() - t0) / n_timed if n_timed else 0.0
    for i, terms in enumerate(all_terms):
        total = float(terms["total"])
        print(f"step {i + 1}: loss={total:.4f}  (step {per_step:.3f}s amortized)")
        assert np.isfinite(total), "non-finite loss"
    print("train smoke OK")

    if args.ops:
        from multihmr_tpu.utils.profiling import device_op_table, profile_trace

        logdir = args.trace or "/tmp/multihmr_train_trace"
        runs = 3
        with profile_trace(logdir):
            for _ in range(runs):
                params, opt_state, terms = step(params, opt_state, batch, 0)
            jax.block_until_ready(params)
        print(f"trace written to {logdir}")
        print(f"{'ms/step':>9}  {'count':>5}  op")
        for name, ms, cnt in device_op_table(logdir, top=args.ops, runs=runs):
            print(f"{ms:9.3f}  {cnt:5d}  {name[:110]}")

    if args.json and n_timed:
        import json

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_TRAIN.json",
        )
        try:
            with open(path) as f:
                doc = json.load(f)
        except (FileNotFoundError, ValueError):
            doc = {"device": jax.devices()[0].device_kind, "results": {}}
        doc["results"][f"{args.model}_batch{args.batch}"] = {
            "s_per_step": round(per_step, 3),
            "tokens": cfg.num_patches + 1,
            "steps_timed": n_timed,
        }
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
