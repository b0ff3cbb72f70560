"""Production batching inference server CLI.

    python -m multihmr_tpu.cli.serve --model_name multiHMR_672_B \
        [--ckpt ...] [--port 8000] [--max_batch 8] [--max_delay_ms 5]
    python -m multihmr_tpu.cli.serve --artifact exported/672B [--port 8000]

Unlike ``cli.app`` (the interactive single-image demo mirroring reference
app.py), this serves concurrent clients through a dynamic batcher that
coalesces requests into one fixed-shape device program — on a v5e, 672_B
runs batch 8 at the same per-image latency as batch 1, so a loaded server
gets ~8× the demo's throughput (BENCH_SWEEP.json: 161 img/s).

``--artifact``: serve a ``tools/export_model.py`` AOT artifact — weights,
batch shape, and detection params come from the artifact and the server
starts without re-tracing the model (the artifact must have been exported
on/for this platform).
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", type=str, default="multiHMR_672_B")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--artifact", type=str, default=None,
                   help="serve an exported AOT artifact directory")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_delay_ms", type=float, default=5.0)
    p.add_argument("--det_thresh", type=float, default=0.3)
    p.add_argument("--nms_kernel_size", type=int, default=3)
    p.add_argument("--max_queue", type=int, default=64,
                   help="bounded request queue: beyond this depth new "
                        "requests are shed with HTTP 429 + Retry-After "
                        "instead of queueing without bound (0 = unbounded)")
    p.add_argument("--deadline_s", type=float, default=30.0,
                   help="per-request dispatch deadline: a request still "
                        "queued after this many seconds fails with 503 "
                        "instead of wasting a device batch (0 = none)")
    p.add_argument("--json_only", action="store_true",
                   help="skip mesh-tensor readback (disables ?render=1); "
                        "cuts per-request device->host tail latency")
    p.add_argument("--dp", action="store_true",
                   help="data-parallel serving: shard each coalesced batch "
                        "over all local chips (max_batch must divide evenly)")
    args = p.parse_args()

    import jax

    from multihmr_tpu.factory import build_model
    from multihmr_tpu.serve import make_server
    from multihmr_tpu.utils.precision import cast_backbone_bf16

    forward_fn = None
    if args.artifact is not None:
        import sys

        from multihmr_tpu.config import named_config
        from multihmr_tpu.io.export import as_model_forward, load_exported

        loaded = load_exported(args.artifact)
        name = loaded.meta.get("name", "")
        try:
            named_config(name)
        except (KeyError, ValueError):
            p.error(
                f"artifact meta name {name!r} is not a known config — "
                "re-export with tools/export_model.py (which records "
                "--model_name) or export_model(name=...)"
            )
        # detection params and batch shape are baked into the artifact;
        # warn when CLI flags would silently diverge from it
        for flag, meta_key in (("det_thresh", "det_thresh"),
                               ("nms_kernel_size", "nms_kernel_size"),
                               ("max_batch", "batch_size")):
            want, have = getattr(args, flag), loaded.meta.get(meta_key)
            if have is not None and want != have:
                print(
                    f"WARNING: --{flag}={want} ignored — the artifact bakes "
                    f"{meta_key}={have}", file=sys.stderr,
                )
        if args.ckpt is not None:
            print("WARNING: --ckpt ignored — weights come from the artifact",
                  file=sys.stderr)
        args.model_name = name
        args.max_batch = loaded.batch_size
        forward_fn = as_model_forward(loaded)
        # model object still provides cfg/extract_persons/faces (host-side
        # only — its flax net is never traced on this path)
        model, params = build_model(args.model_name)
        assert model.cfg.img_size == loaded.img_size, (
            f"artifact img_size {loaded.img_size} != config "
            f"{model.cfg.img_size} for {name!r}"
        )
        params = loaded._params
    else:
        model, params = build_model(args.model_name, checkpoint=args.ckpt)
        if params is None:
            print("WARNING: no checkpoint given — running with random weights")
            params = model.init_params(jax.random.PRNGKey(0))
        params = cast_backbone_bf16(params)

    mesh = None
    if args.dp:
        from multihmr_tpu.parallel import make_mesh

        assert forward_fn is None, "--dp and --artifact are mutually exclusive"
        mesh = make_mesh(model_parallel=1)
        n = mesh.shape["data"]
        if args.max_batch % n:
            args.max_batch = ((args.max_batch + n - 1) // n) * n
            print(f"--dp: rounding max_batch up to {args.max_batch} "
                  f"({n} chips)")

    srv, batcher = make_server(
        model, params, port=args.port, max_batch=args.max_batch,
        det_thresh=args.det_thresh, nms_kernel_size=args.nms_kernel_size,
        max_delay_ms=args.max_delay_ms, forward_fn=forward_fn,
        json_only=args.json_only, mesh=mesh,
        max_queue=args.max_queue, deadline_s=args.deadline_s,
    )
    print(
        f"serving {args.model_name} on http://0.0.0.0:{args.port} "
        f"(POST /infer[?render=1], GET /healthz, GET /stats; "
        f"batch≤{args.max_batch}, window {args.max_delay_ms} ms)"
    )
    try:
        srv.serve_forever()
    finally:
        batcher.close()


if __name__ == "__main__":
    main()
