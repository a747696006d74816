"""Tiny shared helpers for the ops kernels."""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``x`` (tile/lane padding)."""
    return ((x + m - 1) // m) * m
