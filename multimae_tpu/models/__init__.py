from multimae_tpu.models import registry
from multimae_tpu.models.criterion import (
    MaskedCrossEntropyLoss,
    MaskedL1Loss,
    MaskedMSELoss,
)
from multimae_tpu.models.input_adapters import (
    PatchedInputAdapter,
    SemSegInputAdapter,
)
from multimae_tpu.models.multimae import (
    MultiMAE,
    MultiViT,
    multivit_base,
    multivit_large,
    pretrain_multimae_base,
    pretrain_multimae_large,
)
from multimae_tpu.models.output_adapters import (
    ConvNeXtAdapter,
    DPTOutputAdapter,
    LinearOutputAdapter,
    SegmenterMaskTransformerAdapter,
    SpatialOutputAdapter,
)

__all__ = [
    "registry",
    "MultiMAE",
    "MultiViT",
    "PatchedInputAdapter",
    "SemSegInputAdapter",
    "SpatialOutputAdapter",
    "LinearOutputAdapter",
    "SegmenterMaskTransformerAdapter",
    "ConvNeXtAdapter",
    "DPTOutputAdapter",
    "MaskedCrossEntropyLoss",
    "MaskedMSELoss",
    "MaskedL1Loss",
    "pretrain_multimae_base",
    "pretrain_multimae_large",
    "multivit_base",
    "multivit_large",
]
