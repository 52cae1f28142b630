"""divshot_tpu — a TPU-native Gaussian-splatting training + rendering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of the DIVSHOT
desktop splatting platform (training, differentiable rasterization,
densification strategies, splat file formats, editing ops, viewer), designed
TPU-first: SPMD over device meshes, static shapes, Pallas kernels for the hot
rasterization paths.
"""

__version__ = "0.1.0"

from divshot_tpu.splat.gaussians import GaussianParams  # noqa: F401
from divshot_tpu.core.config import TrainConfig  # noqa: F401
