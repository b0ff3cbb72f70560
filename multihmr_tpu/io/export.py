"""AOT model export: serialized StableHLO artifacts for deployment.

The reference deploys by shipping the Python model code plus a ``.pt``
checkpoint and rebuilding the ``nn.Module`` at load time (reference
demo.py:87-103). TPU serving wants the opposite: trace + lower ONCE, ship
the compiled-IR artifact, and let the serving process run it without the
model code, flax, or the converter on its import path — only the JAX
runtime. ``jax.export`` provides exactly that (versioned StableHLO with a
stable calling convention), so an exported multiHMR is:

    model_dir/
      model.stablehlo   — jax.export.Exported.serialize() bytes
      params.msgpack    — weights (flax msgpack, template-free restore)
      meta.json         — config name/shapes/platforms/version

Notes:
  * the artifact is platform-checked: export on (or for) the platform you
    deploy to. Exporting from a TPU-backed process bakes in the Pallas
    flash-attention path; from CPU, the XLA reference path.
  * detection threshold / NMS kernel are baked in at export time (they are
    compile-time constants in the fixed-shape serving program, exactly as
    in :mod:`multihmr_tpu.serve`).
  * the exported callable takes ``(x [B,S,S,3] f32, K [B,3,3] f32)`` and
    returns a flat dict of arrays (the ``Detections`` namedtuple is
    flattened to ``det_*`` keys so the pytree is plain containers).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MODEL_FILE = "model.stablehlo"
_PARAMS_FILE = "params.msgpack"
_META_FILE = "meta.json"


def make_serving_fn(model, det_thresh: float = 0.3, nms_kernel_size: int = 3):
    """``(params, x, K) -> flat dict of arrays`` wrapper around
    ``model.forward`` with plain-container outputs (export-serializable)."""

    def fn(params, x, K):
        out = dict(
            model.forward(
                params, x, K,
                det_thresh=det_thresh, nms_kernel_size=nms_kernel_size,
            )
        )
        det = out.pop("det")
        out["det_rows"] = det.rows
        out["det_cols"] = det.cols
        out["det_scores"] = det.scores
        out["det_valid"] = det.valid
        return out

    return fn


def export_model(
    model,
    params,
    out_dir: str,
    batch_size: int = 1,
    det_thresh: float = 0.3,
    nms_kernel_size: int = 3,
    platforms: Optional[Sequence[str]] = None,
    name: str = "multihmr",
) -> str:
    """Serialize ``model`` + ``params`` into ``out_dir`` (created). Returns
    ``out_dir``. ``platforms``: lowering targets (default: the current
    backend); pass ``("tpu",)`` to cross-export — note the Pallas-vs-XLA
    attention dispatch follows the EXPORTING process's backend (see module
    docstring)."""
    from flax import serialization

    from jax import export as jexport

    fn = make_serving_fn(model, det_thresh, nms_kernel_size)
    S = model.cfg.img_size
    x_spec = jax.ShapeDtypeStruct((batch_size, S, S, 3), jnp.float32)
    K_spec = jax.ShapeDtypeStruct((batch_size, 3, 3), jnp.float32)
    # dtype/shape introspection only — jnp.asarray here would device-commit
    # every leaf (a full checkpoint upload) just to read .dtype
    p_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.dtype(a.dtype)), params
    )
    exported = jexport.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(p_spec, x_spec, K_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _MODEL_FILE), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, _PARAMS_FILE), "wb") as f:
        f.write(serialization.msgpack_serialize(jax.device_get(params)))
    with open(os.path.join(out_dir, _META_FILE), "w") as f:
        json.dump(
            {
                "name": name,
                "img_size": S,
                "batch_size": batch_size,
                "det_thresh": det_thresh,
                "nms_kernel_size": nms_kernel_size,
                "platforms": list(exported.platforms),
                "max_people": int(model.cfg.max_people),
            },
            f,
            indent=1,
        )
    return out_dir


class ExportedModel:
    """A deserialized serving artifact: ``__call__(x, K) -> dict``.

    Loads with NO model code — only jax + flax.serialization. Weights ride
    along inside the object and are passed to the compiled program on each
    call (never baked in as constants, keeping the executable small)."""

    def __init__(self, exported, params, meta: dict):
        self._exported = exported
        # commit the weights to device ONCE — msgpack_restore yields host
        # numpy leaves, and passing those into the jitted call would
        # re-upload the full weight tree (hundreds of MB for ViT-L) on
        # every single inference call
        self._params = jax.device_put(params)
        self.meta = meta
        self._call = jax.jit(exported.call)

    def __call__(self, x, K):
        out = self._call(self._params, jnp.asarray(x), jnp.asarray(K))
        return dict(out)

    @property
    def batch_size(self) -> int:
        return int(self.meta["batch_size"])

    @property
    def img_size(self) -> int:
        return int(self.meta["img_size"])


def load_exported(model_dir: str) -> ExportedModel:
    """Load an :func:`export_model` artifact directory."""
    from flax import serialization

    from jax import export as jexport

    with open(os.path.join(model_dir, _MODEL_FILE), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(model_dir, _PARAMS_FILE), "rb") as f:
        params = serialization.msgpack_restore(f.read())
    with open(os.path.join(model_dir, _META_FILE)) as f:
        meta = json.load(f)
    return ExportedModel(exported, params, meta)


def as_model_forward(loaded: ExportedModel):
    """Adapt an :class:`ExportedModel` to the ``model.forward``-shaped
    ``(params, x, K) -> out`` contract (``det_*`` arrays re-bundled into a
    :class:`~multihmr_tpu.ops.detection.Detections`) so the artifact can
    drive the same serving/extraction stack as a live model — e.g.
    ``multihmr_tpu.serve.make_server(..., forward_fn=as_model_forward(m))``
    starts serving with zero re-tracing/lowering."""
    from multihmr_tpu.ops.detection import Detections

    def fwd(params, x, K):  # params baked inside the artifact; ignored
        out = loaded(x, K)
        out["det"] = Detections(
            out.pop("det_rows"),
            out.pop("det_cols"),
            out.pop("det_scores"),
            out.pop("det_valid"),
        )
        return out

    return fwd
