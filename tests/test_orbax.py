"""Orbax production checkpoint backend."""

import numpy as np
import jax
import jax.numpy as jnp

from multihmr_tpu.io.checkpoint import OrbaxCheckpointer


def test_orbax_save_restore_prune(tmp_path):
    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": {"x": jnp.ones(5)}}
    ck = OrbaxCheckpointer(str(tmp_path), keep=2)
    for step in range(4):
        ck.save(step, jax.tree_util.tree_map(lambda a: a + step, params))
    assert ck.manager.all_steps() == [2, 3]
    out = ck.restore(
        params_template=jax.tree_util.tree_map(jnp.zeros_like, params)
    )
    np.testing.assert_allclose(
        np.asarray(out["params"]["w"]), np.arange(12.0).reshape(3, 4) + 3
    )
