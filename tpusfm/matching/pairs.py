"""View-pair generation.

Parity with the reference's ``matchPair`` stage
(src/sparseBuilder/sparseBuilder.cpp:758-807): EXHAUSTIVE all-pairs (the
default, .cpp:786) and CONTIGUOUS windowed pairs (.cpp:784-797) which is the
reference's scale lever for long sequences (SURVEY.md §5 long-context analog).

Pair lists are host-side numpy (they parameterize sharding and batching, not
device compute).
"""

from __future__ import annotations

import numpy as np


def exhaustive_pairs(n_views: int) -> np.ndarray:
    """All (i, j) with i < j — O(N^2) (exhaustivePairs, .cpp:786)."""
    i, j = np.triu_indices(n_views, k=1)
    return np.stack([i, j], axis=1).astype(np.int32)


def contiguous_pairs(n_views: int, window: int = 5) -> np.ndarray:
    """(i, j) with 0 < j - i <= window (contiguousWithOverlap, .cpp:793-797)."""
    out = []
    for i in range(n_views):
        for j in range(i + 1, min(i + 1 + window, n_views)):
            out.append((i, j))
    return np.asarray(out, dtype=np.int32).reshape(-1, 2)


def shard_pairs(pairs: np.ndarray, n_shards: int) -> list[np.ndarray]:
    """Split a pair list into near-equal shards (device-parallel matching,
    SURVEY.md §2.3 item 3).  Round-robin keeps per-shard work balanced when
    contiguous pairs cluster by view."""
    return [pairs[s::n_shards] for s in range(n_shards)]


def pad_pairs(pairs: np.ndarray, multiple: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad the pair list to a multiple (static shapes for jit); returns
    (padded_pairs, valid_mask).  Padding repeats pair 0 and is masked out."""
    n = len(pairs)
    if n == 0:
        padded = np.zeros((multiple, 2), np.int32)
        return padded, np.zeros((multiple,), bool)
    m = ((n + multiple - 1) // multiple) * multiple
    pad = np.repeat(pairs[:1], m - n, axis=0)
    return np.concatenate([pairs, pad]), np.arange(m) < n
