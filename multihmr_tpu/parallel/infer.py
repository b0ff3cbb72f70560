"""Data-parallel batched inference driver.

Equivalent role of the reference's folder loop in demo.py:315-384, scaled:
images are batched and the batch axis is sharded over the ``data`` mesh axis
— one jit program, every chip processes its shard, results gathered to host.
On one chip this degrades to plain batching; on a pod slice XLA splits the
batch over ICI with zero code change.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from multihmr_tpu.parallel.sharding import make_mesh, batch_sharding, replicated


def folder_inference(
    model,
    params,
    images: Sequence[np.ndarray],  # list of [S, S, 3] preprocessed images
    K: np.ndarray,  # [3, 3] shared intrinsics (or [N, 3, 3] per image)
    det_thresh: float = 0.3,
    nms_kernel_size: int = 3,
    batch_size: Optional[int] = None,
    mesh=None,
    fields: Optional[Sequence[str]] = None,
) -> List[list]:
    """Run the model over a set of images, data-parallel over the mesh.

    Returns per-image person lists (host-side dicts like extract_persons).
    The image count is padded to a full final batch; padding outputs are
    dropped. ``fields`` restricts the device→host readback per batch (see
    :meth:`MultiHMR.extract_persons`).
    """
    if mesh is None:
        mesh = make_mesh(model_parallel=1)
    n_data = mesh.shape["data"]
    if batch_size is None:
        batch_size = n_data
    assert batch_size % n_data == 0, (batch_size, n_data)

    params = jax.device_put(params, replicated(mesh, params))
    x_sh = batch_sharding(mesh)

    fwd = jax.jit(
        lambda p, x, K: model.forward(
            p, x, K, det_thresh=det_thresh, nms_kernel_size=nms_kernel_size
        ),
        in_shardings=(replicated(mesh, params), x_sh, x_sh),
        out_shardings=None,
    )

    K = np.asarray(K, np.float32)
    if K.ndim == 2:
        K = np.broadcast_to(K, (len(images), 3, 3))

    results: List[list] = []
    n = len(images)
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        pad = batch_size - len(idxs)
        xb = np.stack([images[i] for i in idxs] + [images[idxs[-1]]] * pad)
        Kb = np.stack([K[i] for i in idxs] + [K[idxs[-1]]] * pad)
        with mesh:
            out = fwd(params, jnp.asarray(xb), jnp.asarray(Kb))
        persons = model.extract_persons(out, fields=list(fields) if fields else None)
        results.extend(persons[: len(idxs)])
    return results
