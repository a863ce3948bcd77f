"""Conversion and developer tooling (xtask equivalents)."""
