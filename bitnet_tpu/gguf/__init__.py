"""GGUF format support: mmap reader, v3 writer, synthetic fixtures."""

from .constants import (
    DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGML_TYPE_SIZES,
    GGMLType,
    GGUFValueType,
    type_nbytes,
)
from .reader import GGUFReader, TensorInfo, check_magic
from .writer import GGUFWriter

__all__ = [
    "DEFAULT_ALIGNMENT",
    "GGUF_MAGIC",
    "GGML_TYPE_SIZES",
    "GGMLType",
    "GGUFValueType",
    "type_nbytes",
    "GGUFReader",
    "TensorInfo",
    "check_magic",
    "GGUFWriter",
]
