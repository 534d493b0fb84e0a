"""paddle3d_tpu — TPU-native 3D perception framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference Paddle3D (see SURVEY.md): same YAML-config + registry + Trainer
API surface, fixed-shape TPU-first compute path.
"""
__version__ = "0.1.0"

from . import datasets, geometries, models, ops, rendering, transforms
from .sample import Sample, SampleMeta
