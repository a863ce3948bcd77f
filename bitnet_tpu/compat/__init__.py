"""Drop-in API-compatibility surfaces for other frameworks' users.

``bitnet_tpu.compat.llama`` mirrors the llama-cpp-python ``Llama`` class
(reference: ``crates/bitnet-py/src/llama_compat.py``) on top of the TPU
engine.
"""

from .llama import (
    Llama,
    LlamaCache,
    LlamaGrammar,
    llama_backend_free,
    llama_backend_init,
)

__all__ = ["Llama", "LlamaCache", "LlamaGrammar",
           "llama_backend_init", "llama_backend_free"]
