"""Microbenchmark the Pallas flash-attention kernels on the current backend.

Usage: python tools/bench_attention.py [--shapes 896 1288] [--bwd]

Reports per-call latency and achieved TFLOP/s for the transposed-stream
forward kernel (the model's hot path) and, with --bwd, the custom-VJP
forward+backward at each named resolution's ViT-L shape.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {  # name -> (H, N) for ViT-L (Dh=64); N includes the cls token
    "672": (16, 2305),
    "896": (16, 4097),
    "1288": (16, 8465),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", nargs="*", default=["896", "1288"])
    p.add_argument("--bwd", action="store_true")
    p.add_argument("--iters", type=int, default=20)
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

    from multihmr_tpu.ops.attention import flash_attention_t
    from multihmr_tpu.utils.profiling import latency_stats

    for name in args.shapes:
        H, N = SHAPES[name]
        D = 64
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (1, H, D, N), jnp.bfloat16)
        k = jax.random.normal(kk, (1, H, D, N), jnp.bfloat16)
        v = jax.random.normal(kv, (1, H, D, N), jnp.bfloat16)
        flops = 4.0 * H * N * N * D  # QK + PV, 2 flops per MAC each

        r = latency_stats(lambda q, k, v: flash_attention_t(q, k, v), (q, k, v),
                          iters=args.iters)
        ms = r["p50_ms"]
        print(f"fwd  {name}: {ms:7.3f} ms  {flops / ms / 1e9:6.1f} TFLOP/s")

        if args.bwd:
            def fwd_bwd(q, k, v):
                def loss(q, k, v):
                    return jnp.sum(flash_attention_t(q, k, v).astype(jnp.float32) ** 2)
                return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

            r = latency_stats(fwd_bwd, (q, k, v), iters=max(4, args.iters // 2))
            ms = r["p50_ms"]
            # bwd ≈ 2.5x fwd flops (s, dp, dv, dk, dq matmuls) + fwd rerun
            print(f"f+b  {name}: {ms:7.3f} ms  {3.5 * flops / ms / 1e9:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
