"""HNSW index lifecycle service.

Parity target: reference ``IndexingService``
(src/vector_db/services/indexing_service.py:14-144): loads M /
ef_construction / flush_threshold from the YAML config, seeds the level rng
with 42, derives a default index file from the storage base path, tracks
``_index_loaded`` / ``_index_modified``, and flushes the index to disk once
``index_size >= flush_threshold`` (after which every insert saves, matching
the reference's observable behavior, indexing_service.py:85-89,137-144).

Additions over the reference: ``insert_nodes`` batched ingest (single
device program per batch) and ``search_batch`` passthrough.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

from vector_db_tpu.config import load_config
from vector_db_tpu.index.hnsw import HNSW
from vector_db_tpu.storage import MMapNodeStorage, NodeStorage
from vector_db_tpu.types import Node


class IndexingService:
    def __init__(
        self,
        storage: NodeStorage,
        config_path: str,
        index_file: Optional[str] = None,
    ) -> None:
        self.storage = storage
        self.config_path = Path(config_path)
        config = load_config(self.config_path)
        index_config = config.get("index", {})
        M = index_config.get("M", 16)
        ef_construction = index_config.get("ef_construction", 200)

        if index_file:
            self.index_file = Path(index_file)
        elif isinstance(storage, MMapNodeStorage):
            base = storage.embedding_file.parent / storage.embedding_file.stem.replace(
                ".embeddings", ""
            )
            self.index_file = base.with_suffix(".index.npz")
        else:
            raise ValueError(
                "index_file is required for non-mmap storage backends"
            )

        rng = random.Random(42)
        self.index = HNSW(
            M=M,
            ef_construction=ef_construction,
            rng=rng,
            storage=storage,
            index_file=self.index_file,
        )
        self._index_loaded = self.index_file.exists()
        self._index_modified = False
        self.flush_threshold = index_config.get("flush_threshold", 1000)

    def is_index_loaded(self) -> bool:
        return self._index_loaded

    def insert_node(self, node: Node) -> None:
        self.index.insert_node(node)
        self._index_modified = True
        if self._should_flush():
            self.save_index()

    def insert_nodes(self, nodes: Sequence[Node]) -> None:
        """Batched ingest: one construction-search + commit program per
        batch instead of one per node."""
        if not nodes:
            return
        self.index.insert_nodes(nodes)
        self._index_modified = True
        if self._should_flush():
            self.save_index()

    def delete_node(self, node_id: int) -> None:
        self.index.delete_node(node_id)
        self._index_modified = True

    def search(
        self, query: np.ndarray, k: int, **kwargs: Any
    ) -> List[Tuple[Node, float]]:
        return self.index.search(query, k=k, **kwargs)

    def search_batch(self, queries: np.ndarray, k: int, **kwargs: Any):
        return self.index.search_batch(queries, k, **kwargs)

    def save_index(self) -> None:
        if self._index_modified:
            self.index.save_index()
            self._index_modified = False

    def force_save_index(self) -> None:
        self.index.save_index()
        self._index_modified = False

    def get_index_size(self) -> int:
        return self.index.size

    def _should_flush(self) -> bool:
        return self.get_index_size() >= self.flush_threshold
