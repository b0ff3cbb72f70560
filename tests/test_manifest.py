"""Asset manifest + parity-harness pre-staging (fixture-only: this
environment has no licensed assets, so the machinery must run green on
synthetic fixtures shaped exactly like the official files)."""

import os
import sys

import numpy as np
import pytest

from multihmr_tpu.bodymodel.manifest import (
    SMPLX_NPZ_SPEC,
    check_assets_dir,
    check_mean_params,
    check_smplx_npz,
)


def write_smplx_fixture(path, **overrides):
    """Synthetic SMPLX_NEUTRAL.npz with the official shapes."""
    rng = np.random.default_rng(0)
    data = {
        "v_template": rng.normal(size=(10475, 3)).astype(np.float32),
        "shapedirs": rng.normal(size=(10475, 3, 400)).astype(np.float32),
        "posedirs": rng.normal(size=(10475, 3, 486)).astype(np.float32),
        "J_regressor": rng.random(size=(55, 10475)).astype(np.float32),
        "weights": rng.random(size=(10475, 55)).astype(np.float32),
        "kintree_table": np.stack(
            [np.arange(55) - 1, np.arange(55)]
        ).astype(np.int64),
        "f": rng.integers(0, 10475, size=(20908, 3)).astype(np.int64),
        "lmk_faces_idx": rng.integers(0, 20908, size=(51,)).astype(np.int64),
        "lmk_bary_coords": rng.dirichlet(np.ones(3), size=51).astype(np.float32),
    }
    data.update(overrides)
    np.savez(path, **data)
    return data


def test_smplx_manifest_green_on_official_shapes(tmp_path):
    p = tmp_path / "SMPLX_NEUTRAL.npz"
    write_smplx_fixture(p)
    assert check_smplx_npz(str(p)) == []


def test_smplx_manifest_flags_wrong_shapes(tmp_path):
    p = tmp_path / "SMPLX_NEUTRAL.npz"
    write_smplx_fixture(
        p,
        J_regressor=np.zeros((54, 10475), np.float32),  # wrong joint count
        shapedirs=np.zeros((10475, 3, 15), np.float32),  # too few blend cols
    )
    problems = check_smplx_npz(str(p))
    assert any("J_regressor" in m for m in problems)
    assert any("blend columns" in m for m in problems)
    # a missing key is reported by name
    d = {k: v for k, v in np.load(str(p)).items() if k != "weights"}
    np.savez(str(p), **d)
    assert any("missing key 'weights'" in m for m in check_smplx_npz(str(p)))


def test_assets_dir_report(tmp_path):
    (tmp_path / "smplx").mkdir()
    write_smplx_fixture(tmp_path / "smplx" / "SMPLX_NEUTRAL.npz")
    np.savez(
        tmp_path / "smpl_mean_params.npz",
        pose=np.zeros(144, np.float32),
        shape=np.zeros(10, np.float32),
        cam=np.zeros(3, np.float32),
    )
    np.save(tmp_path / "J_regressor_h36m.npy", np.zeros((17, 6890), np.float32))
    report = check_assets_dir(str(tmp_path))
    assert report["problems"] == []
    assert report["found"] == {
        os.path.join("smplx", "SMPLX_NEUTRAL.npz"): 0,
        "smpl_mean_params.npz": 0,
        "J_regressor_h36m.npy": 0,
    }
    # required asset present -> only optional files listed missing
    assert not any("REQUIRED" in m for m in report["missing"])
    assert any("smplx2smpl" in m for m in report["missing"])


def test_assets_dir_requires_loadable_path(tmp_path):
    """The REQUIRED check must track factory.load_body_model's probe paths:
    a valid SMPLX npz at any OTHER location silently falls back to the
    synthetic body model, so the manifest must flag it."""
    (tmp_path / "body_models" / "smplx").mkdir(parents=True)
    write_smplx_fixture(
        tmp_path / "body_models" / "smplx" / "SMPLX_NEUTRAL.npz"
    )
    report = check_assets_dir(str(tmp_path))
    assert any("REQUIRED" in m for m in report["missing"])
    assert any("loader only probes" in p for p in report["problems"])
    # moving it to a probed location clears both
    (tmp_path / "SMPLX_NEUTRAL.npz").write_bytes(
        (tmp_path / "body_models" / "smplx" / "SMPLX_NEUTRAL.npz").read_bytes()
    )
    report = check_assets_dir(str(tmp_path))
    assert not any("REQUIRED" in m for m in report["missing"])


def test_legacy_npz_manifest_warns_but_validates(tmp_path):
    """A legacy 20-column asset is valid for inference (num_betas<=10) but
    incompatible with every num_betas=11 path — the manifest must say so as
    a warning without flipping to INVALID (matching assets.py:80's guard)."""
    (tmp_path / "smplx").mkdir()
    write_smplx_fixture(
        tmp_path / "smplx" / "SMPLX_NEUTRAL.npz",
        shapedirs=np.zeros((10475, 3, 20), np.float32),
    )
    report = check_assets_dir(str(tmp_path))
    assert report["problems"] == []
    assert any("legacy" in w and "num_betas" in w for w in report["warnings"])
    # the full 400-column official asset produces no warning
    write_smplx_fixture(tmp_path / "smplx" / "SMPLX_NEUTRAL.npz")
    report = check_assets_dir(str(tmp_path))
    assert report["warnings"] == []


def test_check_assets_cli_green_on_fixture(tmp_path, capsys):
    """tools/parity_harness.py --check-assets exits 0 on a valid fixture
    tree and 1 when the required SMPL-X file is absent."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        from parity_harness import run_check_assets
    finally:
        sys.path.pop(0)

    (tmp_path / "smplx").mkdir()
    write_smplx_fixture(tmp_path / "smplx" / "SMPLX_NEUTRAL.npz")
    assert run_check_assets(str(tmp_path)) == 0
    out = capsys.readouterr().out
    assert "manifest: OK" in out

    empty = tmp_path / "empty"
    empty.mkdir()
    assert run_check_assets(str(empty)) == 1


def test_mean_params_manifest(tmp_path):
    p = tmp_path / "smpl_mean_params.npz"
    np.savez(p, pose=np.zeros((1, 144), np.float32),
             shape=np.zeros(10, np.float32), cam=np.zeros(3, np.float32))
    assert check_mean_params(str(p)) == []
    np.savez(p, pose=np.zeros(100, np.float32),
             shape=np.zeros(10, np.float32), cam=np.zeros(3, np.float32))
    assert any("pose" in m for m in check_mean_params(str(p)))


def test_capture_stages_shapes_and_order():
    """The jax-side stage capture must expose backbone tokens, detection
    logits, and valid-slot HPH outputs in detection order — the layouts the
    torch-side --stages hooks dump (tools/dump_reference_outputs.py)."""
    import jax
    import jax.numpy as jnp

    from multihmr_tpu.config import ModelConfig, ViTConfig
    from multihmr_tpu.bodymodel import synthetic_body_model
    from multihmr_tpu.models.multihmr import MultiHMR

    TINY = ViTConfig(embed_dim=32, depth=2, num_heads=2)

    class TinyConfig(ModelConfig):
        @property
        def vit(self):
            return TINY

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        from parity_harness import capture_stages, _delta_stats
    finally:
        sys.path.pop(0)

    cfg = TinyConfig(img_size=56, max_people=4, person_center="j5",
                     compute_dtype="float32")
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 56, 56, 3))
    K = jnp.asarray(
        [[[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]]], jnp.float32
    )
    out, stages = capture_stages(model, params, x, K, 0.1, 3)
    g = cfg.grid_size
    n_valid = int(np.asarray(out["det"].valid).sum())
    assert stages["backbone"].shape == (g * g, 32)
    assert stages["det_logits"].shape == (g * g,)
    assert stages["hph_rotmat"].shape == (n_valid, cfg.nrot, 3, 3)
    assert stages["hph_betas"].shape == (n_valid, cfg.num_betas)
    assert stages["hph_cam"].shape == (n_valid,)
    # self-comparison is exactly zero; a perturbed stage is not
    st = _delta_stats(stages["backbone"], stages["backbone"])
    assert st["max_abs"] == 0.0
    st2 = _delta_stats(stages["backbone"], stages["backbone"] + 1e-3)
    assert 0.9e-3 < st2["max_abs"] < 1.1e-3
    # the returned out must be the FULL forward (body-model keys included):
    # the harness feeds it straight into extract_persons for the PVE stage —
    # regression for the net-only out that KeyError'd there
    persons = model.extract_persons(out)[0]
    assert len(persons) == n_valid
    for p in persons:
        assert "v3d" in p and "transl_pelvis" in p


def test_legacy_npz_rejects_num_betas_11(tmp_path):
    """A legacy 20-column shapedirs packs 10 shape + 10 expression: asking
    for 11 betas would hand expression column 0 to BOTH beta 10 and
    expression 0 (silent GT corruption for --num_betas 11 training). The
    loader must refuse loudly; 10 betas must still load, with exprdirs
    starting exactly at column 10."""
    import pytest as _pytest

    from multihmr_tpu.bodymodel.assets import load_smplx_npz

    p = tmp_path / "SMPLX_NEUTRAL.npz"
    data = write_smplx_fixture(
        p, shapedirs=np.random.default_rng(1).normal(
            size=(10475, 3, 20)).astype(np.float32),
    )
    with _pytest.raises(ValueError, match="legacy asset"):
        load_smplx_npz(str(p), num_betas=11)
    bm = load_smplx_npz(str(p), num_betas=10)
    np.testing.assert_array_equal(
        np.asarray(bm.shapedirs), data["shapedirs"][..., :10]
    )
    np.testing.assert_array_equal(
        np.asarray(bm.exprdirs), data["shapedirs"][..., 10:20]
    )


def test_constants_cross_check_green_and_red(tmp_path):
    """The vendored constant tables (bodymodel/constants.py) are cross-
    checked against the npz's joint/landmark/vertex counts; a truncated
    mesh must flag the out-of-range vertex ids."""
    from multihmr_tpu.bodymodel.manifest import (
        check_constants_against_smplx_npz,
    )

    p = tmp_path / "SMPLX_NEUTRAL.npz"
    write_smplx_fixture(p)
    assert check_constants_against_smplx_npz(str(p)) == []

    import numpy as np

    p2 = tmp_path / "SMPLX_SMALL.npz"
    write_smplx_fixture(p2, v_template=np.zeros((5000, 3), np.float32))
    problems = check_constants_against_smplx_npz(str(p2))
    assert any("vertex ids out of range" in m for m in problems)


def test_checkpoint_deep_contract(rng_np=None):
    """check_checkpoint_dict validates the FULL converter contract: a
    correctly-shaped synthetic checkpoint passes; a missing key and a
    transposed tensor are both reported by name."""
    import numpy as np

    from multihmr_tpu.bodymodel.manifest import check_checkpoint_dict
    from tests.test_checkpoint import TinyConfig, make_reference_state_dict

    rng = np.random.default_rng(0)
    cfg = TinyConfig(img_size=56, max_people=4)
    sd = make_reference_state_dict(cfg, rng)
    args = {"backbone": cfg.backbone, "img_size": [cfg.img_size],
            "xat_depth": cfg.xat_depth, "num_betas": cfg.num_betas,
            "person_center": "head"}
    # TinyConfig overrides .vit, which config_from_ckpt_args cannot know —
    # give the manifest the same class through the args it consumes
    import multihmr_tpu.bodymodel.manifest as mf
    import multihmr_tpu.io.checkpoint as ckpt_mod

    orig = ckpt_mod.config_from_ckpt_args
    ckpt_mod.config_from_ckpt_args = lambda a, **kw: cfg
    try:
        ckpt = {"args": args, "model_state_dict": dict(sd)}
        assert check_checkpoint_dict(ckpt, "multiHMR_672_S.pt") == []

        bad = dict(sd)
        bad.pop("mlp_classif.0.weight")
        problems = check_checkpoint_dict(
            {"args": args, "model_state_dict": bad}, "multiHMR_672_S.pt")
        assert any("mlp_classif.0.weight" in m for m in problems)

        bad = dict(sd)
        bad["x_attention_head.decpose.weight"] = np.ascontiguousarray(
            bad["x_attention_head.decpose.weight"].T)
        problems = check_checkpoint_dict(
            {"args": args, "model_state_dict": bad}, "multiHMR_672_S.pt")
        assert any("shape contract" in m and "decpose" in m for m in problems)
    finally:
        ckpt_mod.config_from_ckpt_args = orig


def test_converter_refuses_bad_shapes():
    """convert_torch_checkpoint must REFUSE a layout mismatch (e.g. a
    transposed Linear) instead of silently producing garbage weights."""
    import numpy as np
    import pytest

    from multihmr_tpu.io.checkpoint import convert_torch_checkpoint
    from tests.test_checkpoint import TinyConfig, make_reference_state_dict

    rng = np.random.default_rng(1)
    cfg = TinyConfig(img_size=56, max_people=4)
    sd = make_reference_state_dict(cfg, rng)
    sd["backbone.encoder.blocks.0.mlp.fc1.weight"] = np.ascontiguousarray(
        sd["backbone.encoder.blocks.0.mlp.fc1.weight"].T)
    with pytest.raises(ValueError, match="fc1"):
        convert_torch_checkpoint({"model_state_dict": sd}, cfg)
