"""Profile a named config on the current backend.

Usage:
  python tools/profile_model.py --model_name multiHMR_896_L [--batch 1]
      [--trace /tmp/jx]  [--stages]

Prints slope-based end-to-end latency; with --trace writes a TensorBoard/
Perfetto trace; with --stages also times the ViT alone; with --ops N
captures a trace and prints the top-N ops by device time (the analysis
behind the round-2 perf work — see docs/DESIGN.md).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", default="multiHMR_896_L")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--trace", default=None)
    p.add_argument("--stages", action="store_true")
    p.add_argument(
        "--ops", type=int, default=0, metavar="N",
        help="capture a trace and print the top-N ops by device time",
    )
    args = p.parse_args()

    import jax

    if jax.default_backend() in ("tpu", "axon"):
        # version-keyed cache (NOT a raw jax_compilation_cache_dir: stale
        # unkeyed AOT entries die with libtpu version mismatches after an
        # upgrade — see utils/cache.py), anchored at the repo root so the
        # tool shares bench.py's warm cache from any cwd
        from multihmr_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()  # repo-root .jax_cache
    import jax.numpy as jnp

    from multihmr_tpu.factory import build_model
    from multihmr_tpu.utils.precision import cast_backbone_bf16
    from multihmr_tpu.utils.profiling import latency_stats, profile_trace

    model, _ = build_model(args.model_name)
    # bf16 weight storage like bench.py/serving — otherwise the op table is
    # polluted by per-call fp32→bf16 converts of the stacked weights (~2.7 ms
    # at ViT-L) that no production path pays
    params = cast_backbone_bf16(model.init_params(jax.random.PRNGKey(0)))
    jax.block_until_ready(params)
    S = model.cfg.img_size
    B = args.batch
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, S, 3), jnp.float32)
    K = jnp.broadcast_to(
        jnp.asarray([[754.0, 0, S / 2], [0, 754.0, S / 2], [0, 0, 1.0]], jnp.float32),
        (B, 3, 3),
    )

    fwd = lambda p, x: model.forward(p, x, K)
    r = latency_stats(fwd, (params, x), iters=args.iters)
    print(
        f"{args.model_name} B={B}: {r['p50_ms']:.2f} ms/batch"
        f" = {r['p50_ms']/B:.2f} ms/img = {1000*B/r['p50_ms']:.1f} img/s"
    )

    if args.stages:
        from multihmr_tpu.models.vit import DINOv2ViT

        vit = DINOv2ViT(model.cfg.vit, grid_size=model.cfg.grid_size)
        vp = {"params": params["params"]["backbone"]}
        rv = latency_stats(
            lambda p, x: vit.apply(p, x)["patch_tokens"], (vp, x), iters=args.iters
        )
        print(f"  vit: {rv['p50_ms']:.2f} ms  (rest: {r['p50_ms']-rv['p50_ms']:.2f} ms)")

    if args.trace or args.ops:
        logdir = args.trace or "/tmp/multihmr_trace"
        f = jax.jit(fwd)
        jax.block_until_ready(f(params, x))
        runs = 3
        with profile_trace(logdir):
            for _ in range(runs):
                jax.block_until_ready(f(params, x))
        print(f"trace written to {logdir}")
        if args.ops:
            from multihmr_tpu.utils.profiling import device_op_table

            print(f"{'ms/run':>9}  {'count':>5}  op")
            for name, ms, cnt in device_op_table(logdir, top=args.ops, runs=runs):
                print(f"{ms:9.3f}  {cnt:5d}  {name[:80]}")


if __name__ == "__main__":
    main()
