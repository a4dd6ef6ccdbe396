"""On-device place-recognition retrieval: a padded ring-buffer cosine index.

The reference's loop retrieval is a host GEMM that grows O(#keyframes)
unbounded (``/root/reference/src/PlaceRecognizer.cc:26-52``; SURVEY §5.7).
The TPU-native form keeps the descriptor database HBM-resident in a
fixed-capacity ring buffer (static shapes — no recompiles as the map grows)
and runs the scan as one jitted masked GEMM + top-k. The host
CosineDescriptorIndex remains the default for the loop worker (the database
is small and the worker is off the critical path); this version serves
large maps and batched multi-query retrieval.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("top_k",), donate_argnums=())
def _query(db, ids, size, query, exclude_recent, min_score, top_k: int):
    q = query / jnp.maximum(jnp.linalg.norm(query), 1e-12)
    scores = db @ q  # (cap,)
    limit = size - exclude_recent
    pos = jnp.arange(db.shape[0])
    valid = (pos < limit) & (scores >= min_score)
    masked = jnp.where(valid, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, top_k)
    return top_scores, ids[top_idx]


class DeviceCosineIndex:
    """Fixed-capacity insertion-ordered cosine index on device."""

    def __init__(self, capacity: int = 4096, dim: int = 512):
        self.capacity = capacity
        self._db = jnp.zeros((capacity, dim), jnp.float32)
        self._ids = jnp.zeros((capacity,), jnp.int32)
        self._size = 0

    def __len__(self) -> int:
        return self._size

    def add(self, keyframe_id: int, descriptor: np.ndarray) -> None:
        if self._size >= self.capacity:
            raise RuntimeError("DeviceCosineIndex capacity exceeded")
        d = np.asarray(descriptor, np.float32).reshape(-1)
        n = float(np.linalg.norm(d))
        if n > 1e-12:
            d = d / n
        # Functional update keeps the buffer HBM-resident.
        self._db = self._db.at[self._size].set(jnp.asarray(d))
        self._ids = self._ids.at[self._size].set(keyframe_id)
        self._size += 1

    def query(
        self,
        descriptor: np.ndarray,
        exclude_recent: int,
        top_k: int,
        min_score: float,
    ) -> list[tuple[int, float]]:
        """Returns [(keyframe_id, score)] sorted descending, filtered."""
        if self._size == 0 or self._size <= exclude_recent:
            return []
        k = min(top_k if top_k > 0 else self._size, self.capacity)
        scores, ids = _query(
            self._db,
            self._ids,
            jnp.int32(self._size),
            jnp.asarray(np.asarray(descriptor, np.float32).reshape(-1)),
            jnp.int32(exclude_recent),
            jnp.float32(min_score),
            k,
        )
        scores = np.asarray(scores)
        ids = np.asarray(ids)
        keep = np.isfinite(scores)
        return [(int(i), float(s)) for i, s in zip(ids[keep], scores[keep])]
