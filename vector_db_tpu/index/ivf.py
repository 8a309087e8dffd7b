"""IVF index — JAX k-means + padded inverted lists + fused probe scoring.

Parity target: reference ``IvfIndex`` (src/vector_db/indexing/ivf.py:13-241):
same constructor ``IvfIndex(k, storage, index_file)``, same validation
errors, ``build_index`` (k-means over the in-memory embedding matrix),
``add`` (assign to nearest centroid), ``delete``, ``search(query, n_probe,
top_k) -> [(Node, L2)]``, ``get_cluster_size`` / ``get_cluster_stats``, and
index-file persistence.

TPU-first differences:
- k-means is the vmapped JAX Lloyd's from ``ops.kmeans`` (reference: scipy
  ``kmeans2(iter=100, minit='points')``, ivf.py:75) — E and M steps are MXU
  matmuls;
- inverted lists are a -1-padded ``int32[k, max_list]`` slot table in HBM;
  ``search`` is one jitted program per query batch: centroid distance
  matmul → top-n_probe → member gather → masked distance matmul → top-k
  (reference probes clusters with a per-member Python loop calling
  ``storage.get_embedding``, ivf.py:169-199);
- embeddings mirror into a device table keyed by slot, like the HNSW index.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from vector_db_tpu.ops.distance import BIG, gather_l2_sq, l2_sq_pairwise
from vector_db_tpu.ops.kmeans import kmeans
from vector_db_tpu.ops.topk import masked_top_k_smallest
from vector_db_tpu.storage import InMemoryNodeStorage, NodeStorage
from vector_db_tpu.storage.device_store import DeviceVectorStore
from vector_db_tpu.types import Node


@functools.partial(
    jax.jit, static_argnames=("n_probe", "top_k", "use_filter")
)
def _ivf_search_batch(
    centroids: jnp.ndarray,      # f32[k, d]
    lists: jnp.ndarray,          # int32[k, max_list], -1 padded (slots)
    emb: jnp.ndarray,            # f32[capacity, d]
    has_emb: jnp.ndarray,        # bool[capacity]
    queries: jnp.ndarray,        # f32[B, d]
    fmask: jnp.ndarray,          # bool[capacity] (ignored unless use_filter)
    n_probe: int,
    top_k: int,
    use_filter: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cd = l2_sq_pairwise(queries, centroids)  # [B, k]
    _, probe = jax.lax.top_k(-cd, n_probe)   # [B, n_probe]

    def one(q, probe_row):
        members = lists[probe_row].reshape(-1)  # [n_probe * max_list]
        safe = jnp.maximum(members, 0)
        ok = has_emb[safe]
        if use_filter:
            ok = ok & fmask[safe]
        d = gather_l2_sq(q, emb, members, ok)
        return masked_top_k_smallest(d, members, top_k)

    return jax.vmap(one)(queries, probe)


@functools.partial(
    jax.jit, static_argnames=("n_probe", "top_k", "rerank")
)
def _ivf_search_batch_pq(
    centroids: jnp.ndarray,   # f32[k, d]
    lists: jnp.ndarray,       # int32[k, max_list]
    codes: jnp.ndarray,       # int32[capacity, chunks]
    codebooks: jnp.ndarray,   # f32[chunks, ksub, subdim]
    emb: jnp.ndarray,         # f32[capacity, d] (rerank only)
    has_emb: jnp.ndarray,
    queries: jnp.ndarray,
    queries_rot: jnp.ndarray,  # queries in code space (OPQ; may alias)
    n_probe: int,
    top_k: int,
    rerank: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IVF-PQ probe: candidate scoring is asymmetric PQ distance via
    per-query LUTs (the classic IVFADC layout, here with the LUT gather as
    vmapped indexing and an optional exact rerank of the final top-k)."""
    from vector_db_tpu.index.pq import _adc_lut

    cd = l2_sq_pairwise(queries, centroids)
    _, probe = jax.lax.top_k(-cd, n_probe)
    lut = _adc_lut(queries_rot, codebooks)  # [B, chunks, ksub]

    def one(q, probe_row, lut_q):
        members = lists[probe_row].reshape(-1)
        safe = jnp.maximum(members, 0)
        c = codes[safe]  # [P, chunks]
        g = jax.vmap(lambda lm, cm: lm[cm], in_axes=(0, 1), out_axes=1)(
            lut_q, c
        )
        d = jnp.sum(g, axis=1)
        ok = (members >= 0) & has_emb[safe]
        d = jnp.where(ok, d, BIG)
        if rerank:
            # fetch a wider ADC candidate set, rerank exactly, then cut —
            # reranking only the final top_k cannot recover candidates the
            # quantizer misranked past position top_k
            fetch = min(4 * top_k, members.shape[0])
            fd, fi = masked_top_k_smallest(d, members, fetch)
            fd = gather_l2_sq(q, emb, fi, has_emb[jnp.maximum(fi, 0)])
            return masked_top_k_smallest(fd, fi, top_k)
        return masked_top_k_smallest(d, members, top_k)

    return jax.vmap(one)(queries, probe, lut)


class IvfIndex:
    def __init__(
        self,
        k: int,
        storage: Optional[NodeStorage] = None,
        index_file: Optional[Union[str, Path]] = None,
    ) -> None:
        if k <= 0:
            raise ValueError("k-means parameter should be positive")
        self.k = int(k)
        self.storage = storage or InMemoryNodeStorage()
        self.index_file = Path(index_file) if index_file else None

        self.centroids: Optional[np.ndarray] = None
        self._centroids_dev: Optional[jnp.ndarray] = None
        # host inverted lists of node ids (parity + persistence)
        self.inverted_lists: List[List[int]] = []
        # device: padded slot table, rebuilt lazily when dirty
        self._lists_dev: Optional[jnp.ndarray] = None
        self._lists_dirty = True

        self._store = DeviceVectorStore(capacity=256)

        if self.index_file and self.index_file.exists():
            self.load_index()

    # device tables live in DeviceVectorStore
    @property
    def _emb(self):
        return self._store.emb

    @property
    def _has_emb(self):
        return self._store.valid

    @property
    def _capacity(self) -> int:
        return self._store.capacity

    @property
    def _dim(self):
        return self._store.dim

    @property
    def _slot_of_id(self):
        return self._store._slot_of_id

    @property
    def _id_of_slot(self):
        return self._store.export_id_map()

    # ------------------------------------------------------------------
    def _ensure_capacity(self, need: int, dim: int) -> None:
        self._store.ensure_dim(dim)
        self._store.grow_to(need)

    def _device_lists(self) -> jnp.ndarray:
        if self._lists_dirty or self._lists_dev is None:
            max_list = max((len(l) for l in self.inverted_lists), default=0)
            max_list = max(max_list, 1)
            table = np.full((self.k, max_list), -1, np.int32)
            for c, ids in enumerate(self.inverted_lists):
                for j, nid in enumerate(ids):
                    slot = self._slot_of_id.get(nid, -1)
                    table[c, j] = slot
            self._lists_dev = jnp.asarray(table)
            self._lists_dirty = False
        return self._lists_dev

    # ------------------------------------------------------------------
    def build_index(self, nodes: Sequence[Node], seed: int = 0) -> None:
        if not nodes:
            raise ValueError("Cannot build index with empty node list")
        for node in nodes:
            self.storage.save(node)

        embeddings = np.array([np.asarray(n.embedding, np.float32) for n in nodes])
        ids = [n.id for n in nodes]
        if embeddings.ndim != 2:
            raise ValueError(
                f"embeddings must be 2D array, got {embeddings.ndim}D"
            )
        if embeddings.shape[0] < self.k:
            raise ValueError(
                f"Need at least {self.k} vectors for {self.k} clusters"
            )

        self._ensure_capacity(len(nodes), embeddings.shape[1])
        slots = np.array(
            [self._store.slot_of(nid) if nid in self._store
             else self._store.take_slot(nid) for nid in ids],
            np.int32,
        )
        self._store.write(slots, embeddings)

        cents, labels = kmeans(
            jnp.asarray(embeddings), self.k, jax.random.key(seed), iters=100
        )
        self.centroids = np.asarray(cents)
        self._centroids_dev = cents
        labels = np.asarray(labels)

        self.inverted_lists = [[] for _ in range(self.k)]
        for nid, label in zip(ids, labels):
            self.inverted_lists[int(label)].append(nid)
        self._lists_dirty = True

        if self.index_file:
            self.save_index()

    def add(self, node: Node) -> None:
        if self.centroids is None:
            raise ValueError("Index must be built before adding nodes")
        embedding = np.asarray(node.embedding, np.float32)
        if embedding.ndim != 1:
            raise ValueError("embedding must be 1D array")
        if embedding.shape[0] != self.centroids.shape[1]:
            raise ValueError(
                f"embedding dimension {embedding.shape[0]} doesn't match "
                f"centroid dimension {self.centroids.shape[1]}"
            )
        self.storage.save(node)
        self._store.ensure_dim(embedding.shape[0])
        slot = self._store.slot_of(node.id)
        if slot is None:
            slot = self._store.take_slot(node.id)
        self._store.write(np.asarray([slot], np.int32), embedding[None, :])

        distances = np.linalg.norm(self.centroids - embedding, axis=1)
        nearest = int(np.argmin(distances))
        self.inverted_lists[nearest].append(node.id)
        self._lists_dirty = True
        if self.index_file:
            self.save_index()

    def delete(self, node_id: int) -> None:
        for cluster_list in self.inverted_lists:
            if node_id in cluster_list:
                cluster_list.remove(node_id)
        self._store.release(node_id)
        self._lists_dirty = True
        if hasattr(self.storage, "delete"):
            self.storage.delete(node_id)
        if self.index_file:
            self.save_index()

    # ------------------------------------------------------------------
    def _validate_query(self, query: np.ndarray, n_probe: int) -> None:
        if self.centroids is None:
            raise ValueError("Index must be built before searching")
        if query.ndim != 1:
            raise ValueError("query must be 1D array")
        if query.shape[0] != self.centroids.shape[1]:
            raise ValueError(
                f"query dimension {query.shape[0]} doesn't match "
                f"centroid dimension {self.centroids.shape[1]}"
            )
        if n_probe <= 0 or n_probe > self.k:
            raise ValueError(f"n_probe must be between 1 and {self.k}")

    def search(
        self, query: np.ndarray, n_probe: int, top_k: int
    ) -> List[Tuple[Node, float]]:
        query = np.asarray(query, np.float32)
        self._validate_query(query, n_probe)
        dists, ids = self.search_batch(query[None, :], n_probe, top_k)
        out: List[Tuple[Node, float]] = []
        for nid, d in zip(ids[0], dists[0]):
            if nid < 0:
                continue
            node = self.storage.get(int(nid))
            if node is not None:
                out.append((node, float(d)))
        return out

    def enable_pq(self, chunks: int = 16, ksub: int = 256, seed: int = 0,
                  restarts: int = 2, opq_iters: int = 0) -> None:
        """Attach IVF-PQ scoring: train codebooks on the stored vectors and
        encode them; subsequent ``search_batch(..., pq=True)`` scores probed
        candidates by asymmetric PQ distance with exact rerank.
        ``opq_iters`` > 0 trains an OPQ rotation first (PQCodec.train)."""
        from vector_db_tpu.index.pq import PQCodec

        if self.centroids is None:
            raise ValueError("Index must be built before enabling PQ")
        live = np.asarray(self._has_emb)
        n_live = int(live.sum())
        ksub = min(ksub, max(2, n_live))
        self._pq = PQCodec(k=ksub, chunks=chunks, dim=self._dim)
        emb_np = np.asarray(self._emb)
        self._pq.train(emb_np[live], seed=seed, restarts=restarts,
                       opq_iters=opq_iters)
        codes = np.zeros((self._capacity, chunks), np.int32)
        codes[live] = self._pq.encode(emb_np[live])
        self._pq_codes = jnp.asarray(codes)

    def search_batch(
        self, queries: np.ndarray, n_probe: int, top_k: int,
        pq: bool = False, rerank: bool = True, filter_ids=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Device fast path: (L2 f32[B, top_k], ids int64[B, top_k]).
        ``filter_ids`` masks candidates in-kernel (exact path only)."""
        if self.centroids is None:
            raise ValueError("Index must be built before searching")
        q = jnp.asarray(np.asarray(queries, np.float32))
        use_filter = filter_ids is not None
        fmask = jnp.asarray(
            self._store.filter_mask(filter_ids) if use_filter
            else np.zeros((self._capacity,), bool)
        )
        if pq:
            if getattr(self, "_pq", None) is None:
                raise ValueError("call enable_pq() first")
            d_sq, slots = _ivf_search_batch_pq(
                self._centroids_dev, self._device_lists(), self._pq_codes,
                self._pq.codebooks, self._emb, self._has_emb, q,
                self._pq.rotate_queries(q),
                n_probe=int(n_probe), top_k=int(top_k), rerank=rerank,
            )
        else:
            d_sq, slots = _ivf_search_batch(
                self._centroids_dev, self._device_lists(), self._emb,
                self._has_emb, q, fmask,
                n_probe=int(n_probe), top_k=int(top_k),
                use_filter=use_filter,
            )
        d_sq = np.asarray(d_sq)
        slots = np.asarray(slots)
        ids = self._store.ids_of(slots)
        dists = np.where(slots >= 0, np.sqrt(np.maximum(d_sq, 0.0)), np.inf)
        return dists.astype(np.float32), ids

    # ------------------------------------------------------------------
    def get_cluster_size(self, cluster_id: int) -> int:
        if cluster_id < 0 or cluster_id >= self.k:
            raise ValueError(f"cluster_id must be between 0 and {self.k - 1}")
        return len(self.inverted_lists[cluster_id])

    def get_cluster_stats(self) -> dict:
        sizes = [len(lst) for lst in self.inverted_lists]
        return {
            "min_size": min(sizes) if sizes else 0,
            "max_size": max(sizes) if sizes else 0,
            "avg_size": sum(sizes) / len(sizes) if sizes else 0,
            "total_vectors": sum(sizes),
        }

    # ------------------------------------------------------------------
    def save_index(self) -> None:
        if self.index_file is None or self.centroids is None:
            return
        self.index_file.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            self.index_file,
            k=self.k,
            centroids=self.centroids,
            list_ids=np.concatenate(
                [np.asarray(l, np.int64) for l in self.inverted_lists]
            ) if any(self.inverted_lists) else np.zeros((0,), np.int64),
            list_sizes=np.asarray(
                [len(l) for l in self.inverted_lists], np.int64
            ),
        )

    def load_index(self) -> None:
        if self.index_file is None or not self.index_file.exists():
            return
        with np.load(self.index_file) as z:
            self.k = int(z["k"])
            self.centroids = np.asarray(z["centroids"])
            sizes = np.asarray(z["list_sizes"])
            flat = np.asarray(z["list_ids"])
        self._centroids_dev = jnp.asarray(self.centroids)
        self.inverted_lists = []
        off = 0
        for s in sizes:
            self.inverted_lists.append([int(x) for x in flat[off : off + s]])
            off += int(s)
        self._lists_dirty = True
        # hydrate embeddings from storage
        all_ids = [nid for lst in self.inverted_lists for nid in lst]
        if all_ids:
            dim = self.centroids.shape[1]
            self._ensure_capacity(len(all_ids), dim)
            embs, slots = [], []
            for nid in all_ids:
                try:
                    v = np.asarray(self.storage.get_embedding(nid), np.float32)
                except KeyError:
                    continue
                slot = self._store.slot_of(nid)
                slots.append(slot if slot is not None
                             else self._store.take_slot(nid))
                embs.append(v)
            if embs:
                self._store.write(
                    np.asarray(slots, np.int32), np.stack(embs)
                )
