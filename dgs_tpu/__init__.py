"""TPU-native differentiable Gaussian sampling engine."""

from .config import SamplerConfig, tri_size, tri_index  # noqa: F401
