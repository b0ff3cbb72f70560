"""Gradient NaN-safety of rotation ops at degenerate inputs."""

import numpy as np
import jax
import jax.numpy as jnp

from multihmr_tpu.ops import rot6d_to_rotmat, rotvec_to_rotmat, rotmat_to_rotvec


def test_rot6d_grad_finite_at_degenerate_inputs():
    # collinear a1/a2 (the reference's eye-derived hand-joint init layout)
    # and exactly-zero 6d inputs
    xs = jnp.asarray(
        [
            [1, 0, 0, 1, 0, 0],  # collinear
            [0, 0, 0, 0, 0, 0],  # zero
            [1, 0, 0, 0, 1, 0],  # identity
        ],
        jnp.float32,
    )

    def loss(x):
        return jnp.sum(rot6d_to_rotmat(x) ** 2)

    g = jax.grad(loss)(xs)
    assert np.isfinite(np.asarray(g)).all()


def test_rotvec_grad_finite_at_zero():
    rv = jnp.zeros((3, 3), jnp.float32)
    g = jax.grad(lambda r: jnp.sum(rotvec_to_rotmat(r) ** 2))(rv)
    assert np.isfinite(np.asarray(g)).all()


def test_rotmat_to_rotvec_grad_finite_at_identity():
    R = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))

    def loss(R):
        return jnp.sum(rotmat_to_rotvec(R) ** 2)

    g = jax.grad(loss)(R)
    assert np.isfinite(np.asarray(g)).all()
