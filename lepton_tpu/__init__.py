"""lepton_tpu: TPU-native lossless JPEG recompression (lepton-compatible)."""

__version__ = "0.1.0"
