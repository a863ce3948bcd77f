"""Verification: receipts, activation tracing, logits parity, compat."""

from .receipts import (
    InferenceReceipt,
    generate_receipt,
    validate_receipt,
)
from .reference import compare_logits, cosine_similarity, reference_forward
from .trace import TraceRecord, TraceSink, compare_records

__all__ = [
    "InferenceReceipt",
    "generate_receipt",
    "validate_receipt",
    "compare_logits",
    "cosine_similarity",
    "reference_forward",
    "TraceRecord",
    "TraceSink",
    "compare_records",
]
