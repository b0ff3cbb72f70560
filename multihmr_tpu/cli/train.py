"""Training/eval CLI — the analogue of reference train.py:484-591.

Usage:
    python -m multihmr_tpu.cli.train --backbone dinov2_vitb14 --img_size 336 \
        [--eval_only 1] [--pretrained ckpt.msgpack] ...

Flags mirror the reference argparse surface (model/data/optim + loss weights
via LossWeights fields).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser()
    # model (reference train.py:549-571)
    p.add_argument("--backbone", type=str, default="dinov2_vitb14")
    p.add_argument("--img_size", type=int, default=336)
    p.add_argument("--xat_depth", type=int, default=2)
    p.add_argument("--xat_num_heads", type=int, default=8)
    p.add_argument("--person_center", type=str, default="head")
    p.add_argument("--num_betas", type=int, default=10)
    p.add_argument("--max_people", type=int, default=16)
    p.add_argument(
        "--remat", type=str, default="auto", choices=["auto", "0", "1"],
        help="rematerialize ViT activations in the backward pass. 'auto' "
        "(default) picks the fastest level whose estimated HBM footprint "
        "fits the chip (train/memory.py — no remat at 896² batch-1, 'mlp' "
        "at 1288², 'block' beyond); '0'/'1' force it off/on",
    )
    p.add_argument(
        "--remat_policy", type=str, default=None, choices=["block", "mlp"],
        help="'mlp' recomputes only the fc1 hidden state — the backward "
        "never re-runs the flash-attention forward (measured 10-16%% faster "
        "steps than 'block' at 896²/1288²); 'block' is full-block remat for "
        "when memory is the binding constraint. With --remat auto, a pinned "
        "policy restricts auto's choice to {{off, that policy}}; with "
        "--remat 1 the default is 'mlp'",
    )
    # data
    p.add_argument("--trainset", type=str, default="bedlam")
    p.add_argument(
        "--valset", type=str, nargs="+", default=["ehf"],
        choices=("bedlam", "ehf", "3dpw"),
        help="val dataset(s) evaluated each epoch — the reference default "
        "is all three: BEDLAM-validation EHF-test 3DPW-test "
        "(--val_data/--val_split, train.py:554-555)",
    )
    p.add_argument(
        "--val_split", type=str, nargs="+", default=None,
        help="per-valset split (default: 'validation' for bedlam, 'test' "
        "otherwise — the reference defaults, train.py:555)",
    )
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--iter_per_epoch", type=int, default=1000)
    p.add_argument("--n_epoch", type=int, default=100)
    p.add_argument(
        "--max_iter", type=int, default=0,
        help="when >0, run max_iter // iter_per_epoch epochs instead of "
        "--n_epoch (reference train.py:568,590)",
    )
    p.add_argument("--subsample", type=int, default=1)
    p.add_argument(
        "--train_subsample", type=int, default=1,
        help="train-set subsampling stride (reference train.py:562)",
    )
    p.add_argument(
        "--num_workers", "-j", type=int, default=0,
        help="host data-loading worker threads (bounded ordered map over "
        "batch builders — the torch DataLoader-workers analogue, reference "
        "train.py:563); 0 = load in-process",
    )
    p.add_argument(
        "--extension", type=str, default="png", choices=("png", "jpg"),
        help="train-image extension; 'jpg' reads the create_jpeg siblings "
        "(reference train.py:576, datasets/bedlam.py:62-78)",
    )
    p.add_argument(
        "--res", type=int, default=None,
        help="resolution suffix of the jpg siblings — any size create_jpeg "
        "produced (the reference restricts to 512/1280, train.py:577)",
    )
    p.add_argument(
        "--val_subsample", type=int, nargs="+", default=None,
        help="per-valset subsampling stride for fast evaluation (reference "
        "train.py:557 defaults 25/1/20 for BEDLAM/EHF/3DPW); default: "
        "--subsample for every valset",
    )
    p.add_argument(
        "--train_n", type=int, default=-1,
        help="truncate the train set to its first N images — 'for "
        "debugging purpose only' (reference train.py:536,553)",
    )
    p.add_argument(
        "--val_n", type=int, nargs="+", default=[-1],
        help="per-valset truncation to the first N images (reference "
        "train.py:504,556)",
    )
    p.add_argument(
        "--amp", type=int, default=1, choices=(0, 1),
        help="1 = bf16 compute in the backbone — the TPU analogue of the "
        "reference's fp16 autocast (train.py:569,293-305); 0 = full fp32 "
        "compute, the chip-validated fallback when the bf16 vertex delta "
        "matters (BASELINE.md bf16-sensitivity study)",
    )
    # eval knobs inside training (reference train.py:357,441,575,579-580)
    p.add_argument("--det_thresh", type=float, default=0.2)
    p.add_argument("--nms_kernel_size", type=int, default=3)
    p.add_argument(
        "--visu_to_save", type=int, default=0,
        help="save [img|pred|GT] triptychs for the first N eval images "
        "under logdir/name (reference train.py:441-469)",
    )
    p.add_argument(
        "--log_freq", type=int, default=100,
        help="progress-print period, in eval images (reference "
        "train.py:320,432,567)",
    )
    # optim (reference train.py:514,570)
    p.add_argument("--lr", type=float, default=5e-6)
    p.add_argument(
        "--clip_grad", type=float, default=0.0,
        help="global grad-norm clip (0 = off, reference parity). The j2d/v2d "
        "1/z reprojection grads can blow up at high lr — clipping keeps the "
        "params finite (the Trainer aborts on a sustained NaN streak).",
    )
    # parallelism (TPU-native addition — the reference is single-GPU,
    # SURVEY §2.3; validated by parallel/dryrun.py on an 8-device mesh)
    p.add_argument(
        "--n_devices", type=int, default=0,
        help="devices to train on (0 = all visible; 1 = single-device path)",
    )
    p.add_argument(
        "--model_parallel", type=int, default=1,
        help="size of the mesh 'model' axis (Megatron TP over ViT heads; "
        "must divide n_devices and the backbone head count)",
    )
    p.add_argument(
        "--tp_mode", type=str, default="heads", choices=("heads", "ring"),
        help="model-axis strategy: 'heads' = Megatron TP, 'ring' = "
        "sequence-parallel ring attention",
    )
    p.add_argument(
        "--fsdp", type=int, default=0,
        help="1 = ZeRO/FSDP: shard large params + Adam moments over 'data'",
    )
    # logging / ckpt
    p.add_argument("--name", type=str, default="run")
    p.add_argument("--logdir", type=str, default="logs")
    p.add_argument("--ckptdir", type=str, default="ckpts")
    p.add_argument("--nb_max_ckpt", type=int, default=3)
    p.add_argument("--pretrained", type=str, default=None)
    p.add_argument(
        "--resume", type=int, default=0,
        help="resume from the latest full train state in ckptdir/name "
        "(params + optimizer moments + epoch, saved every epoch via orbax); "
        "starts fresh when none exists — a preempted job restarts with the "
        "SAME command line. The reference always restarts at epoch 0 "
        "(train.py:184-238).",
    )
    p.add_argument("--eval_only", type=int, default=0)
    # loss weights (reference loss.py:117-141)
    from multihmr_tpu.train.loss import LossWeights

    for f in dataclasses.fields(LossWeights):
        p.add_argument(f"--{f.name}", type=type(f.default), default=f.default)
    return p


def main():
    args = build_argparser().parse_args()
    import jax
    import jax.numpy as jnp
    import optax

    from multihmr_tpu.config import ModelConfig
    from multihmr_tpu.factory import load_body_model
    from multihmr_tpu.models.multihmr import MultiHMR
    from multihmr_tpu.train.loss import LossWeights
    from multihmr_tpu.train.trainer import Trainer
    from multihmr_tpu.train.evaluate import evaluate_dataset
    from multihmr_tpu.data.collate import collate_padded
    from multihmr_tpu.utils.logging import MetricsLogger

    cfg = ModelConfig(
        backbone=args.backbone,
        img_size=args.img_size,
        xat_depth=args.xat_depth,
        xat_num_heads=args.xat_num_heads,
        person_center=args.person_center,
        num_betas=args.num_betas,
        max_people=args.max_people,
        compute_dtype="bfloat16" if args.amp else "float32",
    )
    # Resolve the remat level against the PER-DEVICE batch (the stash the
    # chip actually holds under data parallelism).
    n_dev = args.n_devices or len(jax.devices())
    data_size = (
        n_dev // args.model_parallel
        if (n_dev > 1 or args.model_parallel > 1 or args.fsdp) else 1
    )
    from multihmr_tpu.train.memory import resolve_remat_flags

    remat, policy, report = resolve_remat_flags(
        args.remat, args.remat_policy, cfg,
        max(1, args.batch_size // max(1, data_size)),
    )
    if report is not None:
        print(
            f"remat auto: estimates {report['estimates_gb']} GB vs "
            f"{report['budget_bytes'] / 1e9:.1f} GB budget -> "
            f"{'remat=' + policy if remat else 'no remat'}"
        )
    cfg = dataclasses.replace(cfg, remat=remat, remat_policy=policy)
    bm, real = load_body_model(cfg.num_betas)
    # GT targets run through an 11-beta neutral SMPL-X like the reference
    # (train.py:41-43, 99-110), independent of the model's num_betas.
    gt_bm, _ = load_body_model(11) if cfg.num_betas != 11 else (bm, real)
    if not real:
        print("WARNING: SMPL-X assets not found — using the synthetic body model")

    mesh = None
    if n_dev > 1 or args.model_parallel > 1 or args.fsdp:
        from multihmr_tpu.parallel import make_mesh

        assert n_dev % args.model_parallel == 0, (n_dev, args.model_parallel)
        assert args.batch_size % data_size == 0, (
            f"batch_size {args.batch_size} must divide over the data axis "
            f"({data_size})"
        )
        mesh = make_mesh(
            n_dev, model_parallel=args.model_parallel,
            devices=jax.devices()[:n_dev],
        )
        print(
            f"mesh: data={data_size} x model={args.model_parallel} "
            f"({args.tp_mode}), fsdp={bool(args.fsdp)}"
        )
    model = MultiHMR(cfg, bm, mesh=mesh, tp_mode=args.tp_mode)

    if args.pretrained:
        if args.pretrained.endswith(".msgpack"):
            from multihmr_tpu.io.checkpoint import load_checkpoint

            params, _ = load_checkpoint(
                args.pretrained, model.init_params(jax.random.PRNGKey(0))
            )
        else:  # torch checkpoint
            from multihmr_tpu.io.checkpoint import convert_torch_checkpoint

            params = convert_torch_checkpoint(args.pretrained, cfg)
    else:
        params = model.init_params(jax.random.PRNGKey(0))
        # From-scratch training starts from the SMPL mean pose when the
        # asset exists (reference model.py:440-477); the no-asset fallback
        # is the neutral identity-6d layout baked into HPH's initializers.
        from multihmr_tpu.io.checkpoint import apply_mean_params

        params = apply_mean_params(params, cfg)

    logger = MetricsLogger(args.logdir, args.name)
    weights = LossWeights(
        **{
            f.name: getattr(args, f.name)
            for f in dataclasses.fields(LossWeights)
        }
    )

    # Eval runs single-device (batch 1 per image, reference train.py:506):
    # under a mesh the train params are gathered to host and fed to a
    # mesh-free twin so the B=1 eval batches never hit the data-axis
    # sharding constraint.
    eval_model = model if mesh is None else MultiHMR(cfg, bm)

    # Per-valset knob broadcasting (reference train.py:498 asserts equal
    # lengths; a single value here broadcasts to every valset).
    valsets = list(args.valset)

    def _per_set(v, default):
        vals = [default] * len(valsets) if v is None else list(v)
        if len(vals) == 1 and len(valsets) > 1:
            vals = vals * len(valsets)
        assert len(vals) == len(valsets), (
            f"need one value per valset {valsets}, got {vals}")
        return vals

    val_split = _per_set(args.val_split, None)
    val_n = _per_set(args.val_n, -1)
    val_sub = _per_set(args.val_subsample, args.subsample)

    def run_eval(params, epoch):
        if mesh is not None:
            params = jax.device_get(params)
        all_res = {}
        for vi, vname in enumerate(valsets):
            gt_fwd, eval_kw = None, {}
            if vname == "ehf":
                from multihmr_tpu.data.ehf import EHF

                split = val_split[vi] or "test"
                ds = EHF(img_size=cfg.img_size, split=split,
                         n=val_n[vi], subsample=val_sub[vi])
            elif vname == "3dpw":
                from multihmr_tpu.data.threedpw import THREEDPW
                from multihmr_tpu.bodymodel.assets import (
                    load_smpl_pkl, load_smplx2smpl, load_j_regressor_h36m,
                    synthetic_body_model)
                from multihmr_tpu.train.evaluate import make_smpl_gt_forward
                from multihmr_tpu.factory import SMPLX_DIR

                # 3DPW GT is gendered-SMPL params (6890-vert topology) —
                # PVE against SMPL-X predictions is undefined without the
                # smplx2smpl regressor (reference train.py:383-384). Both
                # the reference tree layout (models/smplx/, models/smpl/ —
                # utils/constants.py:16, train.py:400) and our flat
                # manifest layout are accepted.
                def _find(*cands):
                    return next((p for p in cands if os.path.isfile(p)), None)

                s2s = _find(
                    os.path.join(SMPLX_DIR, "smplx", "smplx2smpl.pkl"),
                    os.path.join(SMPLX_DIR, "smplx2smpl.pkl"))
                if s2s is None:
                    print(f"3dpw eval SKIPPED: smplx2smpl.pkl not found "
                          f"under {SMPLX_DIR} (needed to map SMPL-X "
                          "predictions onto the SMPL-topology GT, "
                          "reference train.py:44-45,383-384)")
                    continue
                eval_kw = {"smplx2smpl": load_smplx2smpl(s2s)}
                jr = _find(
                    os.path.join(SMPLX_DIR, "smpl", "J_regressor_h36m.npy"),
                    os.path.join(SMPLX_DIR, "J_regressor_h36m.npy"))
                if jr is not None:  # MPJPE tier (reference :397-429)
                    eval_kw["J_regressor_h36m"] = load_j_regressor_h36m(jr)
                split = val_split[vi] or "test"
                ds = THREEDPW(img_size=cfg.img_size, split=split,
                              n=val_n[vi], subsample=val_sub[vi],
                              smpl_dir=SMPLX_DIR)
                layers = {}
                for g, fn in (("male", "SMPL_MALE.pkl"),
                              ("female", "SMPL_FEMALE.pkl")):
                    path = os.path.join(SMPLX_DIR, "smpl", fn)
                    if os.path.isfile(path):
                        layers[g] = load_smpl_pkl(path)
                    else:  # keep the pipeline runnable without licensed pkls
                        print(f"WARNING: {path} not found — synthetic "
                              f"{g} SMPL for 3dpw GT")
                        layers[g] = synthetic_body_model(
                            num_vertices=6890, num_joints=24,
                            num_extra=0, num_lmk=0)
                gt_fwd = make_smpl_gt_forward(
                    layers, capacity=cfg.max_people)
            elif vname == "bedlam":
                from multihmr_tpu.data.bedlam import BEDLAM
                from multihmr_tpu.train.evaluate import make_smplx_gt_forward

                split = val_split[vi] or "validation"
                ds = BEDLAM(split=split, training=False,
                            img_size=cfg.img_size,
                            n=val_n[vi], subsample=val_sub[vi])
                # GT meshes from the stored SMPL-X params through the same
                # 11-beta neutral layer as training (reference train.py:41-43)
                gt_fwd = make_smplx_gt_forward(
                    gt_bm, num_betas=11, capacity=cfg.max_people)
            else:  # unreachable: argparse choices
                raise ValueError(vname)
            res = evaluate_dataset(
                eval_model, params, ds,
                det_thresh=args.det_thresh,
                nms_kernel_size=args.nms_kernel_size,
                gt_forward=gt_fwd,
                log_every=args.log_freq,
                visu_to_save=args.visu_to_save,
                visu_dir=os.path.join(args.logdir, args.name,
                                      f"visu_{vname}"),
                faces=(np.asarray(bm.faces)
                       if args.visu_to_save > 0 else None),
                **eval_kw,
            )
            # reference tag shape: {name}-{split}-{subsample}/{metric}
            # (train.py:477-479)
            logger.scalars(  # scalars only — 'timings' is a nested dict
                {k: v for k, v in res.items() if isinstance(v, (int, float))},
                epoch, prefix=f"{vname}-{split}-{val_sub[vi]}/")
            print(f"eval[{vname}-{split}] epoch {epoch}: {res}")
            all_res[vname] = res
        # .get: a valset can be skipped (3dpw without smplx2smpl)
        return all_res if len(valsets) > 1 else all_res.get(valsets[0])

    if args.eval_only:
        run_eval(params, 0)
        return

    from multihmr_tpu.data.bedlam import BEDLAM

    trainset = BEDLAM(
        split="training", training=True, img_size=cfg.img_size,
        n_iter=args.batch_size * args.iter_per_epoch, n=args.train_n,
        subsample=args.train_subsample,
        extension=args.extension, res=args.res,
    )

    def make_batch(start):
        samples = []
        for i in range(start, min(start + args.batch_size, len(trainset))):
            x, annot = trainset[i]
            humans = annot["humans"]
            samples.append(
                {
                    "image": x,
                    "K": annot["K"],
                    "humans": [
                        {
                            "pose": np.concatenate(
                                [h["smplx_root_pose"], h["smplx_body_pose"],
                                 h["smplx_left_hand_pose"], h["smplx_right_hand_pose"],
                                 h["smplx_jaw_pose"]], 0),
                            "shape": h["smplx_shape"][:11],
                            "transl": h["smplx_transl"],
                        }
                        for h in humans
                    ],
                }
            )
        batch = collate_padded(samples, cfg.max_people)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def data_iter():
        # --num_workers > 0: decode/resize/collate in a bounded ordered
        # thread map (the torch-DataLoader-workers analogue; reference
        # train.py:538-546). 0 = in-process, reference parity.
        from multihmr_tpu.data.prefetch import bounded_parallel_map

        yield from bounded_parallel_map(
            make_batch,
            range(0, len(trainset), args.batch_size),
            num_workers=args.num_workers,
        )

    optimizer = optax.adam(args.lr)
    if args.clip_grad > 0:
        optimizer = optax.chain(
            optax.clip_by_global_norm(args.clip_grad), optimizer
        )
    trainer = Trainer(
        model,
        optimizer,
        weights=weights,
        checkpoint_dir=os.path.join(args.ckptdir, args.name),
        nb_max_ckpt=args.nb_max_ckpt,
        gt_body_model=gt_bm,
        mesh=mesh,
        fsdp=bool(args.fsdp),
        log_every_steps=args.log_freq,
    )
    start_epoch, opt_state = 0, None
    if args.resume:
        restored = trainer.restore(params)
        if restored is None:
            print("--resume: no saved train state found — starting fresh")
        else:
            params, opt_state, start_epoch = restored
            print(f"--resume: restored epoch {start_epoch - 1}, "
                  f"continuing at epoch {start_epoch}")
    # --max_iter caps total optimizer steps via the epoch count
    # (reference train.py:590: max_epochs = max_iter // n_iters_per_epoch)
    epochs = (args.max_iter // args.iter_per_epoch
              if args.max_iter > 0 else args.n_epoch)
    trainer.fit(params, data_iter, epochs=epochs, eval_fn=run_eval,
                start_epoch=start_epoch, opt_state=opt_state)


if __name__ == "__main__":
    main()
