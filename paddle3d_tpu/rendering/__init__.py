"""Neural rendering suite (reference: contrib/PaddleRendering/pprndr —
NeRF-family models with 6 CUDA extensions: grid_encoder, ffmlp,
ray_marching, sh_encoder, trunc_exp, undistort).

TPU-native re-design: hash-grid and SH encoders as fused gather/einsum
programs, fixed-shape stratified + importance ray sampling, and volume
rendering as masked cumulative products — no custom kernels needed; the
whole train step is one XLA program.
"""
from . import datasets  # noqa: F401 (registers components)
from .cameras import generate_rays, radial_tangential_undistort
from .encoders import HashGridEncoder, NeRFPositionalEncoding, SHEncoder
from .fields import InstantNGPField, NeRFField
from .models import NF_MODELS, InstantNGP, NeRF
from .renderer import render_rays, trunc_exp
from .samplers import sample_pdf, sample_stratified

__all__ = [
    "HashGridEncoder", "SHEncoder", "NeRFPositionalEncoding",
    "NeRFField", "InstantNGPField", "NeRF", "InstantNGP", "NF_MODELS",
    "render_rays", "trunc_exp", "sample_stratified", "sample_pdf",
    "generate_rays", "radial_tangential_undistort",
]
