"""Model layer: config extraction, functional transformer, GGUF loader."""

from .bitnet import BitNetParams, BlockParams, embed_tokens, forward, logits
from .config import config_from_gguf
from .loader import LoadReport, load_model

__all__ = [
    "BitNetParams",
    "BlockParams",
    "embed_tokens",
    "forward",
    "logits",
    "config_from_gguf",
    "LoadReport",
    "load_model",
]
