"""multihmr_tpu — a TPU-native multi-person human mesh recovery framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of naver/multi-hmr
(reference mounted at /root/reference): single-shot multi-person 3D human mesh
recovery from a single RGB image. One ViT forward pass yields per-patch human
detections, camera-ray conditioned queries, and cross-attention regression of
parametric body-model (SMPL-X / Anny) parameters, which a fused
blendshape+FK+LBS layer turns into camera-space meshes.

Design principles (TPU-first, not a port):
  * Static shapes everywhere: the reference's dynamic ``torch.where`` person
    indexing (reference model.py:149) is re-expressed as fixed-capacity top-K
    detection with validity masks, so the whole pipeline is one XLA program.
  * bf16 matmul path on the MXU with fp32 parameters and fp32 geometry.
  * Pallas flash-attention for the ViT hot loop; fused einsum LBS.
  * Batch/tensor parallelism via jax.sharding.Mesh + NamedSharding, never
    host-side loops.
"""

__version__ = "0.1.0"

from multihmr_tpu.config import ModelConfig, VITS, VITB, VITL  # noqa: F401
