from multimae_tpu.ops.posemb import build_2d_sincos_posemb
from multimae_tpu.ops.resize import interpolate_2d

__all__ = ["build_2d_sincos_posemb", "interpolate_2d"]
