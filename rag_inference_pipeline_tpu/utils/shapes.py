"""Shape bucketing: XLA compiles one program per distinct shape, so dynamic
request batches are padded up a fixed bucket ladder (SURVEY.md section 7.4
item 7 — the reference's continuous batch sizes must quantize to buckets).
"""

from __future__ import annotations

from typing import Sequence


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; the largest bucket caps oversize batches."""
    if n <= 0:
        raise ValueError("n must be positive")
    for b in sorted(buckets):
        if n <= b:
            return b
    return max(buckets)


def chunk_spans(n: int, max_chunk: int):
    """Split [0, n) into spans of at most max_chunk rows."""
    return [(s, min(s + max_chunk, n)) for s in range(0, n, max_chunk)]


def pad_rows(arr, bucket: int, pad_value=0):
    """Pad axis 0 of a numpy array up to `bucket` rows."""
    import numpy as np

    n = arr.shape[0]
    if n == bucket:
        return arr
    if n > bucket:
        raise ValueError(f"batch {n} exceeds bucket {bucket}")
    pad = [(0, bucket - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=pad_value)
