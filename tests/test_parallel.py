"""Multi-device sharding: dryrun the full sharded train step on the virtual
8-device CPU mesh, plus unit checks of the sharding rules."""

import numpy as np
import jax
from jax.sharding import PartitionSpec as P

from multihmr_tpu.parallel import make_mesh, param_shardings


def test_virtual_mesh_available():
    assert len(jax.devices()) >= 8


def test_make_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(8, model_parallel=1)
    assert mesh.shape == {"data": 8, "model": 1}


def test_param_sharding_rules():
    mesh = make_mesh(8, model_parallel=2)
    D = 2  # stacked depth axis (scan-over-layers)
    fake = {
        "params": {
            "backbone": {
                "blocks": {
                    "block": {
                        "attn": {
                            "qkv": {"kernel": np.zeros((D, 4, 12)), "bias": np.zeros((D, 12))},
                            "proj": {"kernel": np.zeros((D, 12, 4)), "bias": np.zeros((D, 4))},
                        },
                        "mlp": {
                            "fc1": {"kernel": np.zeros((D, 4, 16)), "bias": np.zeros((D, 16))},
                            "fc2": {"kernel": np.zeros((D, 16, 4)), "bias": np.zeros((D, 4))},
                        },
                    },
                },
                "pos_embed": np.zeros((1, 5, 4)),
            },
            "mlp_classif": {"fc0": {"kernel": np.zeros((4, 4))}},
        }
    }
    sh = param_shardings(mesh, fake)
    blk = sh["params"]["backbone"]["blocks"]["block"]
    assert blk["attn"]["qkv"]["kernel"].spec == P(None, None, "model")
    assert blk["attn"]["qkv"]["bias"].spec == P(None, "model")
    assert blk["attn"]["proj"]["kernel"].spec == P(None, "model", None)
    assert blk["attn"]["proj"]["bias"].spec == P()
    assert blk["mlp"]["fc1"]["kernel"].spec == P(None, None, "model")
    assert blk["mlp"]["fc2"]["kernel"].spec == P(None, "model", None)
    assert sh["params"]["backbone"]["pos_embed"].spec == P()
    assert sh["params"]["mlp_classif"]["fc0"]["kernel"].spec == P()


def test_dryrun_multichip_8():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_folder_inference_dp(rng=None):
    import numpy as np
    import jax
    from multihmr_tpu.config import ModelConfig, ViTConfig
    from multihmr_tpu.bodymodel import synthetic_body_model
    from multihmr_tpu.models.multihmr import MultiHMR
    from multihmr_tpu.parallel.infer import folder_inference

    rng = np.random.default_rng(0)
    cfg = ModelConfig(
        backbone="dinov2_vits14", img_size=56, max_people=4, person_center="j5",
        compute_dtype="float32",
        vit_override=ViTConfig(embed_dim=32, depth=2, num_heads=2),
    )
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))

    images = [rng.normal(size=(56, 56, 3)).astype(np.float32) for _ in range(5)]
    K = np.array([[100.0, 0, 28], [0, 100, 28], [0, 0, 1]], np.float32)
    mesh = make_mesh(4, model_parallel=1)
    results = folder_inference(
        model, params, images, K, det_thresh=0.3, batch_size=4, mesh=mesh
    )
    assert len(results) == 5
    # DP-sharded result must equal single-image forward for image 0
    import jax.numpy as jnp

    out = model.forward(params, jnp.asarray(images[0][None]), jnp.asarray(K[None]))
    single = model.extract_persons(out)[0]
    assert len(results[0]) == len(single)
    for a, b in zip(results[0], single):
        np.testing.assert_allclose(np.asarray(a["v3d"]), np.asarray(b["v3d"]), atol=2e-4)


def test_tp_sharded_forward_matches_replicated():
    """Numerical equivalence: forward with Megatron-TP-sharded params equals
    the unsharded forward (XLA inserts the collectives; results must match)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from multihmr_tpu.config import ModelConfig, ViTConfig
    from multihmr_tpu.bodymodel import synthetic_body_model
    from multihmr_tpu.models.multihmr import MultiHMR
    from multihmr_tpu.parallel import shard_params, batch_sharding

    cfg = ModelConfig(
        backbone="dinov2_vits14", img_size=56, max_people=4, person_center="j5",
        compute_dtype="float32",
        vit_override=ViTConfig(embed_dim=32, depth=2, num_heads=2),
    )
    bm = synthetic_body_model()
    names = [f"j{i}" for i in range(bm.num_output_joints)]
    model = MultiHMR(cfg, bm, person_center_joint_names=names)
    params = model.init_params(jax.random.PRNGKey(0))

    B = 4
    x = jax.random.normal(jax.random.PRNGKey(3), (B, 56, 56, 3))
    K = jnp.broadcast_to(
        jnp.asarray([[100.0, 0, 28], [0, 100, 28], [0, 0, 1]], jnp.float32), (B, 3, 3)
    )
    ref = model.forward(params, x, K)

    mesh = make_mesh(8, model_parallel=2)
    sp = shard_params(mesh, params)
    xb = jax.device_put(x, batch_sharding(mesh))
    Kb = jax.device_put(K, batch_sharding(mesh))
    with mesh:
        out = jax.jit(lambda p, x, K: model.forward(p, x, K))(sp, xb, Kb)
    np.testing.assert_allclose(
        np.asarray(out["v3d"]), np.asarray(ref["v3d"]), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(ref["scores"]), atol=1e-5
    )

    # Now THROUGH the model's mesh-aware shard_map dispatch (the path a real
    # TPU mesh must take — XLA cannot auto-partition the Pallas custom call):
    # heads-sharded TP and ring SP must both equal the replicated forward.
    for tp_mode in ("heads", "ring"):
        tp_model = MultiHMR(
            cfg, bm, person_center_joint_names=names, mesh=mesh, tp_mode=tp_mode
        )
        with mesh:
            out_tp = jax.jit(lambda p, x, K: tp_model.forward(p, x, K))(sp, xb, Kb)
        np.testing.assert_allclose(
            np.asarray(out_tp["v3d"]), np.asarray(ref["v3d"]), atol=5e-4,
            err_msg=tp_mode,
        )
        np.testing.assert_allclose(
            np.asarray(out_tp["scores"]), np.asarray(ref["scores"]), atol=1e-5,
            err_msg=tp_mode,
        )


def test_tp_train_step_matches_replicated():
    """One sharded train step through the mesh-aware attention dispatch must
    produce the same loss as the unsharded step."""
    import numpy as np
    import jax
    import optax
    from multihmr_tpu.config import ModelConfig, ViTConfig
    from multihmr_tpu.bodymodel import synthetic_body_model
    from multihmr_tpu.models.multihmr import MultiHMR
    from multihmr_tpu.parallel import shard_params, batch_sharding
    from multihmr_tpu.train.trainer import make_train_step

    cfg = ModelConfig(
        backbone="dinov2_vits14", img_size=56, max_people=4, person_center="head",
        compute_dtype="float32",
        vit_override=ViTConfig(embed_dim=32, depth=2, num_heads=2),
    )
    bm = synthetic_body_model(num_vertices=64, num_joints=55, num_extra=21, num_lmk=51)
    rng = np.random.default_rng(7)
    B, Kh = 4, cfg.max_people
    batch_np = {
        "image": rng.normal(size=(B, 56, 56, 3)).astype(np.float32),
        "K": np.broadcast_to(
            np.array([[100.0, 0, 28], [0, 100, 28], [0, 0, 1]], np.float32), (B, 3, 3)
        ).copy(),
        "gt_pose": rng.normal(scale=0.2, size=(B, Kh, 53, 3)).astype(np.float32),
        "gt_shape": rng.normal(size=(B, Kh, 10)).astype(np.float32),
        "gt_transl": (
            rng.normal(scale=0.3, size=(B, Kh, 3)) + np.array([0, 0, 3.0])
        ).astype(np.float32),
        "gt_valid": (rng.uniform(size=(B, Kh)) > 0.4).astype(np.float32),
    }
    optimizer = optax.adam(5e-6)

    def one_step(model, params, batch):
        opt_state = jax.jit(optimizer.init)(params)
        step = make_train_step(model, optimizer, donate=False)
        _, _, terms = step(params, opt_state, batch, 0)
        return float(terms["total"])

    base = MultiHMR(cfg, bm)
    params = base.init_params(jax.random.PRNGKey(0))
    ref_loss = one_step(base, params, jax.device_put(batch_np))

    mesh = make_mesh(8, model_parallel=2)
    tp_model = MultiHMR(cfg, bm, mesh=mesh, tp_mode="heads")
    sp = shard_params(mesh, params)
    batch = jax.device_put(batch_np, batch_sharding(mesh, batch_np))
    with mesh:
        tp_loss = one_step(tp_model, sp, batch)
    np.testing.assert_allclose(tp_loss, ref_loss, rtol=1e-5)

    # ZeRO/FSDP: same step with large params ALSO sharded over 'data'.
    from multihmr_tpu.parallel import param_shardings

    fsdp_shardings = param_shardings(mesh, params, fsdp=True, fsdp_min_size=64)
    fp = jax.device_put(params, fsdp_shardings)
    with mesh:
        fsdp_loss = one_step(tp_model, fp, batch)
    np.testing.assert_allclose(fsdp_loss, ref_loss, rtol=1e-5)


def test_fsdp_shardings_shard_large_params_and_opt_state():
    """fsdp=True shards each large leaf over 'data' on a free dimension
    (composing with TP on 'model'), leaves small leaves replicated, and the
    Adam moments initialized under jit inherit the sharded layout — i.e.
    params + optimizer state sit sharded at rest (the ZeRO memory win)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from multihmr_tpu.parallel import param_shardings

    mesh = make_mesh(8, model_parallel=2)
    data = mesh.shape["data"]  # 4
    params = {
        "backbone": {
            "blocks": {"block": {"attn": {"qkv": {
                "kernel": jnp.ones((2, 64, 96)),  # TP on dim 2, FSDP dim 1
                "bias": jnp.ones((2, 96)),        # TP on dim 1, too small
            }}}},
            "patch_embed": {"kernel": jnp.ones((588, 64))},  # FSDP dim 0
        },
        "head": {"tiny": jnp.ones((4, 4))},  # below min_size
    }
    sh = param_shardings(mesh, params, fsdp=True, fsdp_min_size=1024)
    qkv = sh["backbone"]["blocks"]["block"]["attn"]["qkv"]
    assert qkv["kernel"].spec == jax.sharding.PartitionSpec(None, "data", "model")
    assert qkv["bias"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["backbone"]["patch_embed"]["kernel"].spec == \
        jax.sharding.PartitionSpec("data", None)
    assert sh["head"]["tiny"].spec == jax.sharding.PartitionSpec()

    placed = jax.device_put(params, sh)
    k = placed["backbone"]["blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert k.addressable_shards[0].data.shape == (2, 64 // data, 96 // 2)

    # optimizer.init builds state from zeros_like (no data dependency on
    # params), so jit cannot propagate shardings — opt_state_shardings
    # supplies them explicitly.
    from multihmr_tpu.parallel import opt_state_shardings

    opt = optax.adam(1e-3)
    osh = opt_state_shardings(mesh, opt, placed, sh)
    with mesh:
        opt_state = jax.jit(opt.init, out_shardings=osh)(placed)
    mu = opt_state[0].mu["backbone"]["blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert mu.sharding.spec == jax.sharding.PartitionSpec(None, "data", "model")
    assert mu.addressable_shards[0].data.shape == (2, 64 // data, 96 // 2)
    np.testing.assert_array_equal(np.asarray(mu), 0.0)
    count = opt_state[0].count
    assert count.sharding.spec == jax.sharding.PartitionSpec()
