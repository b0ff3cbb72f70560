"""AOT export roundtrip: export_model → load_exported matches direct forward.

The exported artifact must reproduce the live model bit-for-bit on the same
platform (same program, same weights) and must load without the model class
— ``load_exported`` touches only jax + flax.serialization.
"""

import numpy as np
import jax
import jax.numpy as jnp

from multihmr_tpu.config import ModelConfig, ViTConfig
from multihmr_tpu.bodymodel import synthetic_body_model
from multihmr_tpu.models.multihmr import MultiHMR
from multihmr_tpu.io.export import export_model, load_exported, make_serving_fn


TINY_VIT = ViTConfig(embed_dim=32, depth=2, num_heads=2)


class TinyConfig(ModelConfig):
    @property
    def vit(self):
        return TINY_VIT


def _tiny_model():
    cfg = TinyConfig(
        img_size=56, max_people=4, person_center="j5", compute_dtype="float32"
    )
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_export_roundtrip(tmp_path):
    model, params = _tiny_model()
    out_dir = export_model(
        model, params, str(tmp_path / "artifact"), batch_size=2,
        det_thresh=0.1, name="tiny",
    )

    loaded = load_exported(out_dir)
    assert loaded.batch_size == 2
    assert loaded.img_size == 56
    assert loaded.meta["name"] == "tiny"

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    K = np.tile(
        np.asarray([[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]], np.float32),
        (2, 1, 1),
    )

    got = loaded(x, K)
    want = jax.jit(make_serving_fn(model, det_thresh=0.1))(
        params, jnp.asarray(x), jnp.asarray(K)
    )
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32), np.asarray(want[k], np.float32),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )
    # detections flattened to plain arrays
    assert got["det_valid"].shape == (2, 4)


def test_artifact_drives_serving_stack(tmp_path):
    """An exported artifact plugged into the batching server via
    ``as_model_forward`` produces the same persons as the live model."""
    from multihmr_tpu.io.export import as_model_forward
    from multihmr_tpu.serve.server import build_batched_infer

    model, params = _tiny_model()
    out_dir = export_model(
        model, params, str(tmp_path / "a"), batch_size=2, det_thresh=0.1,
    )
    loaded = load_exported(out_dir)

    batcher, _ = build_batched_infer(
        model, params, max_batch=2, det_thresh=0.1,
        forward_fn=as_model_forward(loaded), max_delay_ms=50.0,
    )
    try:
        rng = np.random.default_rng(1)
        x = rng.normal(size=(56, 56, 3)).astype(np.float32)
        K = np.asarray(
            [[100.0, 0, 28], [0, 100.0, 28], [0, 0, 1]], np.float32
        )
        persons = batcher.submit(x, K)

        direct = jax.jit(
            lambda p, x, K: model.forward(p, x, K, det_thresh=0.1)
        )(params, jnp.asarray(x)[None], jnp.asarray(K)[None])
        want = model.extract_persons(jax.device_get(direct))[0]
        assert len(persons) == len(want)
        for got_h, want_h in zip(persons, want):
            np.testing.assert_allclose(
                np.asarray(got_h["v3d"]), np.asarray(want_h["v3d"]),
                rtol=1e-5, atol=1e-5,
            )
    finally:
        batcher.close()


def test_export_is_self_contained(tmp_path):
    """The artifact directory carries everything: model bytes, weights,
    meta — and restores params as plain nested dicts (no flax modules)."""
    model, params = _tiny_model()
    out_dir = export_model(model, params, str(tmp_path / "a"), name="tiny")
    import os

    files = sorted(os.listdir(out_dir))
    assert files == ["meta.json", "model.stablehlo", "params.msgpack"]
    loaded = load_exported(out_dir)
    leaves = jax.tree_util.tree_leaves(loaded._params)
    assert all(isinstance(l, (np.ndarray, jnp.ndarray)) for l in leaves)
