"""Export a multiHMR model as an AOT serving artifact (jax.export).

Usage:
  python tools/export_model.py --model_name multiHMR_896_L --out exported/896L \
      [--checkpoint path.pt] [--batch 8] [--det_thresh 0.3] [--nms 3]

Run this on the deployment platform (TPU process → Pallas attention baked
in). The artifact loads with ``multihmr_tpu.io.export.load_exported`` — or
any process with jax + flax only; see that module's docstring.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", default="multiHMR_896_L")
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--det_thresh", type=float, default=0.3)
    p.add_argument("--nms", type=int, default=3)
    args = p.parse_args()

    import jax

    from multihmr_tpu.factory import build_model
    from multihmr_tpu.io.export import export_model
    from multihmr_tpu.utils.precision import cast_backbone_bf16

    model, params = build_model(args.model_name, checkpoint=args.checkpoint)
    if params is None:
        print("warning: no checkpoint — exporting RANDOM weights", file=sys.stderr)
        params = model.init_params(jax.random.PRNGKey(0))
    params = cast_backbone_bf16(params)

    out = export_model(
        model, params, args.out,
        batch_size=args.batch,
        det_thresh=args.det_thresh,
        nms_kernel_size=args.nms,
        name=args.model_name,
    )
    total = sum(
        os.path.getsize(os.path.join(out, f)) for f in os.listdir(out)
    )
    print(f"exported {args.model_name} → {out} ({total/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
