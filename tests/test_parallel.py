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
