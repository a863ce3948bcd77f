"""Observability: metrics, profiling, hardened timing."""

from .timing import chain_timer

__all__ = ["chain_timer"]
