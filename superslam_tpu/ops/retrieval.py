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
def _query(db, ids, ins, size, query, exclude_recent, min_score, top_k: int):
    q = query / jnp.maximum(jnp.linalg.norm(query), 1e-12)
    scores = db @ q  # (cap,)
    limit = size - exclude_recent
    # ins = insertion index per physical row (-1 = never written); after
    # wraparound each row holds its slot's NEWEST insertion, so masking on
    # ins alone is complete — no stale rows exist.
    valid = (ins >= 0) & (ins < limit) & (scores >= min_score)
    masked = jnp.where(valid, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, top_k)
    return top_scores, ids[top_idx], ins[top_idx]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _ring_add(db, ids, ins, row, kid, i, r):
    """In-place (donated) ring write: an O(dim) dynamic-slice update, not a
    fresh O(capacity*dim) buffer per keyframe add."""
    db = jax.lax.dynamic_update_slice(db, row[None], (r, jnp.int32(0)))
    ids = jax.lax.dynamic_update_index_in_dim(ids, kid, r, 0)
    ins = jax.lax.dynamic_update_index_in_dim(ins, i, r, 0)
    return db, ids, ins


class DeviceCosineIndex:
    """Fixed-capacity cosine RING index on device: past `capacity` inserts,
    the oldest entry is overwritten (the map's distant history ages out of
    retrieval; SURVEY §5.7's bounded-database replacement for the
    reference's unbounded host GEMM)."""

    def __init__(self, capacity: int = 4096, dim: int = 512):
        self.capacity = capacity
        self._db = jnp.zeros((capacity, dim), jnp.float32)
        self._ids = jnp.zeros((capacity,), jnp.int32)
        self._ins = jnp.full((capacity,), -1, jnp.int32)
        self._size = 0

    def __len__(self) -> int:
        return min(self._size, self.capacity)

    @property
    def total_added(self) -> int:
        """Lifetime insertions (> capacity once the ring has wrapped)."""
        return self._size

    def add(self, keyframe_id: int, descriptor: np.ndarray) -> None:
        d = np.asarray(descriptor, np.float32).reshape(-1)
        n = float(np.linalg.norm(d))
        if n > 1e-12:
            d = d / n
        r = self._size % self.capacity
        self._db, self._ids, self._ins = _ring_add(
            self._db,
            self._ids,
            self._ins,
            jnp.asarray(d),
            jnp.int32(keyframe_id),
            jnp.int32(self._size),
            jnp.int32(r),
        )
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
        k = min(top_k if top_k > 0 else self.capacity, self.capacity)
        scores, ids, ins = _query(
            self._db,
            self._ids,
            self._ins,
            jnp.int32(self._size),
            jnp.asarray(np.asarray(descriptor, np.float32).reshape(-1)),
            jnp.int32(exclude_recent),
            jnp.float32(min_score),
            k,
        )
        scores = np.asarray(scores)
        ids = np.asarray(ids)
        ins = np.asarray(ins)
        keep = np.isfinite(scores)
        scores, ids, ins = scores[keep], ids[keep], ins[keep]
        # Exact score ties break by INSERTION order (oldest first) like the
        # host index's stable argsort and the sharded path — after
        # wraparound, top_k's slot-order tie-break no longer matches it.
        order = np.lexsort((ins, -scores))
        return [(int(ids[i]), float(scores[i])) for i in order]


class ShardedCosineIndex:
    """DeviceCosineIndex scaled over a device mesh: database rows are
    sharded across the mesh's ``data`` axis, the query GEMM and a local
    top-k run per shard under ``shard_map``, and only the K per-shard
    winners cross ICI (an ``all_gather`` of K rows per device) before the
    replicated global top-k.

    This is the serving-scale form of the loop retrieval (SURVEY §5.7):
    capacity grows with the mesh while per-query HBM traffic per chip stays
    constant, and the result is bit-identical to the single-device index —
    including the ring semantics (past capacity the oldest entry ages out).
    """

    def __init__(self, mesh, capacity: int = 8192, dim: int = 512):
        import math

        from jax.sharding import NamedSharding, PartitionSpec as P

        # Flatten the whole mesh onto the row axis: retrieval has no model
        # dimension, so every device holds rows.
        self.mesh = mesh
        self._axes = tuple(mesh.axis_names)
        n = math.prod(mesh.shape[a] for a in self._axes)
        if capacity % n:
            capacity += n - capacity % n
        self.capacity = capacity
        sh = NamedSharding(mesh, P(self._axes, None))
        sh1 = NamedSharding(mesh, P(self._axes))
        self._db = jax.device_put(jnp.zeros((capacity, dim), jnp.float32), sh)
        self._ids = jax.device_put(jnp.zeros((capacity,), jnp.int32), sh1)
        self._ins = jax.device_put(jnp.full((capacity,), -1, jnp.int32), sh1)
        self._size = 0

    def __len__(self) -> int:
        return min(self._size, self.capacity)

    @property
    def total_added(self) -> int:
        return self._size

    def add(self, keyframe_id: int, descriptor: np.ndarray) -> None:
        d = np.asarray(descriptor, np.float32).reshape(-1)
        n = float(np.linalg.norm(d))
        if n > 1e-12:
            d = d / n
        # Insertion order interleaves shards (row r lives on device
        # r // (cap/n)): write round-robin so insertion index == logical
        # recency; past capacity the ring revisits rows in the same order,
        # overwriting the oldest. Donated dynamic-slice write: in-place
        # per-shard update, no O(capacity*dim) rebuild or resharding per
        # keyframe add.
        r = self._phys_row(self._size % self.capacity)
        self._db, self._ids, self._ins = _ring_add(
            self._db, self._ids, self._ins,
            jnp.asarray(d), jnp.int32(keyframe_id), jnp.int32(self._size),
            jnp.int32(r),
        )
        self._size += 1

    def _phys_row(self, i: int) -> int:
        """Insertion i -> physical row: round-robin over shards so every
        shard holds an equal prefix of the insertion order."""
        import math

        n = math.prod(self.mesh.shape[a] for a in self._axes)
        shard_rows = self.capacity // n
        return (i % n) * shard_rows + i // n

    def query(
        self,
        descriptor: np.ndarray,
        exclude_recent: int,
        top_k: int,
        min_score: float,
    ) -> list[tuple[int, float]]:
        if self._size == 0 or self._size <= exclude_recent:
            return []
        k = min(top_k if top_k > 0 else self.capacity, self.capacity)
        scores, ids, ins = _sharded_query(
            self.mesh,
            self._axes,
            self._db,
            self._ids,
            self._ins,
            jnp.asarray(np.asarray(descriptor, np.float32).reshape(-1)),
            jnp.int32(self._size),
            jnp.int32(exclude_recent),
            jnp.float32(min_score),
            k,
        )
        scores = np.asarray(scores)
        ids = np.asarray(ids)
        ins = np.asarray(ins)
        keep = np.isfinite(scores)
        scores, ids, ins = scores[keep], ids[keep], ins[keep]
        # Final selection over the <= n_shards*k gathered winners happens
        # HERE so ties break by insertion order exactly like the host
        # index's stable argsort (a device top_k over the shard-major
        # gather would rank tied shard-0 rows above older shard-1 rows).
        order = np.lexsort((ins, -scores))[:k]
        return [(int(ids[i]), float(scores[i])) for i in order]


@functools.partial(jax.jit, static_argnames=("mesh", "axes", "top_k"))
def _sharded_query(mesh, axes, db, ids, ins, query, size, exclude_recent, min_score, top_k: int):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    q = query / jnp.maximum(jnp.linalg.norm(query), 1e-12)
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    shard_rows = db.shape[0] // n_shards
    k_local = min(top_k, shard_rows)

    def local(db_s, ids_s, ins_s, q_s):  # winners + insertion idx; ties on host
        scores = db_s @ q_s  # (shard_rows,)
        # Stored insertion index per row (-1 = never written); after
        # wraparound each row holds its slot's newest insertion.
        limit = size - exclude_recent
        valid = (ins_s >= 0) & (ins_s < limit) & (scores >= min_score)
        masked = jnp.where(valid, scores, -jnp.inf)
        s, i = jax.lax.top_k(masked, k_local)  # per-shard winners
        cand_s = jax.lax.all_gather(s, axes, tiled=True)  # (n*k_local,)
        cand_id = jax.lax.all_gather(ids_s[i], axes, tiled=True)
        cand_ins = jax.lax.all_gather(ins_s[i], axes, tiled=True)
        return cand_s, cand_id, cand_ins

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes, None), P(axes), P(axes), P()),
        out_specs=(P(), P(), P()),
        # The outputs ARE replicated (all_gather + identical top_k on every
        # shard) but the static replication checker can't prove it.
        check_vma=False,
    )(db, ids, ins, q)
