"""Tokenizer acquisition from the HF hub (offline-gated).

Parity surface for ``bitnet-tokenizers/src/download.rs``.  This
environment has zero egress, and production TPU pods often do too, so
downloads are explicit and default-off:

- resolve from a local cache dir first (``BITNET_TOKENIZER_CACHE``),
- only attempt the network when ``BITNET_ALLOW_DOWNLOADS=1``,
- otherwise raise with an actionable message.
"""

from __future__ import annotations

import os
import shutil

from ..errors import TokenizerError

ENV_ALLOW = "BITNET_ALLOW_DOWNLOADS"
ENV_CACHE = "BITNET_TOKENIZER_CACHE"


def cache_dir() -> str:
    return os.environ.get(
        ENV_CACHE, os.path.expanduser("~/.cache/bitnet_tpu/tokenizers"))


def cached_path(repo_id: str, filename: str = "tokenizer.json") -> str:
    return os.path.join(cache_dir(), repo_id.replace("/", "--"), filename)


def fetch_tokenizer(repo_id: str, filename: str = "tokenizer.json") -> str:
    """Resolve a tokenizer file: cache hit → path; else download when
    allowed; else raise TokenizerError."""
    path = cached_path(repo_id, filename)
    if os.path.exists(path):
        return path
    if os.environ.get(ENV_ALLOW, "").strip() not in ("1", "true", "yes"):
        raise TokenizerError(
            f"tokenizer {repo_id}/{filename} not cached at {path} and "
            f"downloads are disabled (set {ENV_ALLOW}=1, or pre-place the "
            f"file, or pass --tokenizer explicitly)")
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise TokenizerError(
            f"huggingface_hub unavailable for download: {e}") from None
    got = hf_hub_download(repo_id=repo_id, filename=filename)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shutil.copyfile(got, path)
    return path


def seed_cache(repo_id: str, local_file: str,
               filename: str = "tokenizer.json") -> str:
    """Pre-place a tokenizer file into the offline cache (air-gap flow)."""
    path = cached_path(repo_id, filename)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shutil.copyfile(local_file, path)
    return path
