"""multimae_tpu — TPU-native multi-modal masked autoencoder framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
EPFL-VILAB/MultiMAE (reference: /root/reference): per-modality input
adapters feeding a shared ViT encoder, Dirichlet task-sampled token
masking executed inside the jitted train step, per-task cross-attention
decoders plus dense heads (linear / Segmenter / ConvNeXt / DPT), masked
reconstruction losses, and the full pretrain / fine-tune workload set.

Design notes (TPU-first):
  * All image tensors are NHWC (TPU-native layout), not NCHW.
  * All interpolation is expressed as separable matmuls (MXU-friendly),
    with exact PyTorch `F.interpolate` numerics for checkpoint parity.
  * Masking (Dirichlet sampling + argsort shuffles) is a pure function of
    a PRNG key with static shapes, so it lives inside the jitted step.
  * Mixed precision is bfloat16 activations with float32 parameters; no
    loss scaler is needed on TPU. Selected output adapters can run fp32
    (reference: multimae/multimae.py:367-377).
  * Data parallelism is a 1-D `data` mesh axis: jit + sharding constraints,
    XLA emits the gradient psum over ICI.
"""

__version__ = "0.1.0"

from multimae_tpu.models import registry as _registry  # noqa: F401
from multimae_tpu.models.registry import create_model, register_model  # noqa: F401
