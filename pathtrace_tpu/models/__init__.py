from pathtrace_tpu.models.denoise_cnn import DenoiseCNN, ResidualBlock
from pathtrace_tpu.models.preprocess import preprocess_channels, preprocess_target

__all__ = [
    "DenoiseCNN",
    "ResidualBlock",
    "preprocess_channels",
    "preprocess_target",
]
