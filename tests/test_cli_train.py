"""End-to-end integration test of the training CLI (cli/train.py::main).

The reference's train.py is driven only as a script (reference
train.py:484-591); ours is too, which left the CLI glue — flag resolution
(incl. the round-5 `--remat auto` default), BEDLAM data_iter assembly,
Trainer wiring, per-epoch checkpointing, and the EHF eval hook — covered
only piecewise. This drives `main()` itself on synthetic on-disk fixtures:
one epoch of training on a 2-image BEDLAM tree, then the epoch-end EHF
evaluation, asserting the checkpoint and eval metrics actually appear.
"""

import os
import struct
import sys

import numpy as np


def _write_bedlam(root, rng, split="training"):
    from PIL import Image

    seq = "seq0"
    (root / split / seq / "png").mkdir(parents=True)
    (root / f"all_npz_12_{split}").mkdir(parents=True)
    n_person, n_img = 2, 2
    rows = n_person * n_img
    imgnames = np.array([f"im{i}.png" for i in range(n_img) for _ in range(n_person)])
    np.savez(
        root / f"all_npz_12_{split}" / f"{seq}.npz",
        pose_cam=rng.normal(scale=0.2, size=(rows, 165)).astype(np.float32),
        cam_int=np.tile(np.array([[500.0, 0, 80], [0, 500, 60], [0, 0, 1]]), (rows, 1, 1)),
        cam_ext=np.tile(np.eye(4), (rows, 1, 1)),
        shape=rng.normal(size=(rows, 11)).astype(np.float32),
        imgname=imgnames,
        trans_cam=(rng.normal(size=(rows, 3)) + [0, 0, 4]).astype(np.float32),
    )
    for i in range(n_img):
        Image.fromarray(
            rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
        ).save(root / split / seq / "png" / f"im{i}.png")


def _write_ehf(root, rng):
    from PIL import Image

    root.mkdir(parents=True)
    # GT meshes must be SMPL-X-shaped: the eval regressor is (55, 10475)
    verts = rng.normal(scale=0.3, size=(10475, 3)).astype(np.float32)
    for i in range(2):
        with open(root / f"{i:02d}_align.ply", "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(f"element vertex {len(verts)}\n".encode())
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(b"end_header\n")
            for v in verts:
                f.write(struct.pack("<fff", *v))
        Image.fromarray(
            rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
        ).save(root / f"{i:02d}_img.png")


def test_train_cli_end_to_end(tmp_path, monkeypatch, capsys):
    rng = np.random.default_rng(0)
    _write_bedlam(tmp_path / "data" / "BEDLAM", rng)
    _write_bedlam(tmp_path / "data" / "BEDLAM", rng, split="validation")
    _write_ehf(tmp_path / "data" / "EHF", rng)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["train",
         "--backbone", "dinov2_vits14", "--img_size", "56",
         "--xat_depth", "1", "--max_people", "4",
         "--batch_size", "2", "--iter_per_epoch", "2", "--n_epoch", "1",
         "--n_devices", "1",
         # reference-style multi-valset eval (train.py:497-513): BEDLAM's
         # validation split through the params→mesh GT forward, plus EHF;
         # per-set truncation exercises --val_n broadcasting
         "--valset", "bedlam", "ehf", "--val_n", "2", "1",
         "--visu_to_save", "1", "--lr", "1e-5",
         "--name", "itest", "--logdir", "logs", "--ckptdir", "ckpts"],
    )
    from multihmr_tpu.cli.train import main

    main()
    out = capsys.readouterr().out
    # --remat auto resolved (tiny model on a big host -> no remat)
    assert "remat auto" in out and "no remat" in out
    # one epoch trained with a finite mean loss
    assert "epoch 0: mean loss" in out and "nan" not in out.lower().split(
        "epoch 0: mean loss")[1][:40]
    # epoch-end eval ran over BOTH valsets, with EHF truncated by --val_n
    assert "eval[bedlam-validation] epoch 0" in out
    assert "eval[ehf-test] epoch 0" in out
    assert "'n_images': 1" in out.split("eval[ehf-test]")[1][:400]
    # --visu_to_save wrote an [img|pred|GT] triptych per valset
    assert os.path.isfile(
        os.path.join("logs", "itest", "visu_bedlam", "eval_0000.png"))
    assert os.path.isfile(
        os.path.join("logs", "itest", "visu_ehf", "eval_0000.png"))
    # a model checkpoint and the full resumable train state were written
    ckpt_dir = os.path.join("ckpts", "itest")
    names = os.listdir(ckpt_dir)
    assert any(n.endswith(".msgpack") for n in names), names
    assert any("state" in n or n.isdigit() for n in names) or any(
        os.path.isdir(os.path.join(ckpt_dir, n)) for n in names), names
    # metrics logged (tensorboard or the JSONL fallback)
    logdir = os.path.join("logs", "itest")
    assert os.path.isdir(logdir) and os.listdir(logdir)


def test_train_cli_eval_only(tmp_path, monkeypatch, capsys):
    rng = np.random.default_rng(1)
    _write_ehf(tmp_path / "data" / "EHF", rng)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["train",
         "--backbone", "dinov2_vits14", "--img_size", "56",
         "--xat_depth", "1", "--max_people", "4",
         "--n_devices", "1",
         # --amp 0 drives the full-fp32-compute fallback (reference --amp,
         # train.py:569) through the whole eval path
         "--valset", "ehf", "--eval_only", "1", "--amp", "0",
         "--name", "itest-eval"],
    )
    from multihmr_tpu.cli.train import main

    main()
    out = capsys.readouterr().out
    assert "eval[ehf-test] epoch 0" in out
    # PVE metrics present in the eval dict repr
    assert "pve" in out


def _write_threedpw(tmp_path, rng):
    """3DPW fixture tree + prebuilt annot pickle (synthetic SMPL for the
    build; the annot file is what the CLI's THREEDPW then loads)."""
    import pickle

    from PIL import Image

    from multihmr_tpu.bodymodel.assets import synthetic_body_model
    import multihmr_tpu.bodymodel.assets as assets

    root = tmp_path / "data" / "3DPW"
    (root / "sequenceFiles" / "test").mkdir(parents=True)
    (root / "imageFiles" / "seq0").mkdir(parents=True)
    T = 2
    meta = {
        "poses": [rng.normal(scale=0.2, size=(T, 72)).astype(np.float32)],
        "trans": [rng.normal(size=(T, 3)).astype(np.float32)],
        "betas": [rng.normal(size=10).astype(np.float32)],
        "genders": ["f"],
        "campose_valid": [np.ones(T)],
        "cam_poses": np.tile(np.eye(4), (T, 1, 1)),
        "cam_intrinsics": np.array([[500.0, 0, 80], [0, 500, 60], [0, 0, 1]]),
        "poses2d": [rng.normal(size=(T, 3, 18)).astype(np.float32)],
    }
    with open(root / "sequenceFiles" / "test" / "seq0.pkl", "wb") as f:
        pickle.dump(meta, f)
    for k in range(T):
        Image.fromarray(
            rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
        ).save(root / "imageFiles" / "seq0" / f"image_{k:05d}.jpg")
    orig = assets.load_smpl_pkl
    assets.load_smpl_pkl = lambda path, num_betas=10: synthetic_body_model(
        num_vertices=6890, num_joints=24, num_extra=0, num_lmk=0
    )
    try:
        from multihmr_tpu.data.threedpw import THREEDPW

        THREEDPW(img_size=56, root_dir=str(root),
                 annotations_dir=str(tmp_path / "data"),
                 force_build_dataset=True)
    finally:
        assets.load_smpl_pkl = orig


def test_train_cli_eval_only_3dpw(tmp_path, monkeypatch, capsys):
    """3dpw valset end-to-end through the CLI: gendered-SMPL GT forward,
    smplx2smpl-mapped PVE, H36M MPJPE tier (reference train.py:383-429) —
    plus the clean skip when smplx2smpl.pkl is absent (without it, SMPL-X
    preds vs SMPL-topology GT have no common vertex space)."""
    import pickle

    rng = np.random.default_rng(2)
    _write_threedpw(tmp_path, rng)
    monkeypatch.chdir(tmp_path)
    argv = ["train",
            "--backbone", "dinov2_vits14", "--img_size", "56",
            "--xat_depth", "1", "--max_people", "4", "--n_devices", "1",
            "--valset", "3dpw", "--eval_only", "1", "--name", "itest-3dpw"]
    monkeypatch.setattr(sys, "argv", argv)
    from multihmr_tpu.cli.train import main

    # no smplx2smpl.pkl → the valset is skipped with a reasoned message
    main()
    out = capsys.readouterr().out
    assert "3dpw eval SKIPPED" in out and "eval[3dpw" not in out

    # with the (synthetic) regressor assets the full metric tier runs
    os.makedirs("models", exist_ok=True)
    with open(os.path.join("models", "smplx2smpl.pkl"), "wb") as f:
        pickle.dump({"matrix": rng.random((6890, 10475)).astype(np.float32) / 10475},
                    f)
    np.save(os.path.join("models", "J_regressor_h36m.npy"),
            rng.random((17, 6890)).astype(np.float32) / 6890)
    main()
    out = capsys.readouterr().out
    assert "eval[3dpw-test] epoch 0" in out
    assert "'n_images': 2" in out.split("eval[3dpw-test]")[1][:400]
    assert "mpjpe" in out.split("eval[3dpw-test]")[1]
