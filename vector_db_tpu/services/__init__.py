from vector_db_tpu.services.storage_service import StorageService
from vector_db_tpu.services.indexing_service import IndexingService
from vector_db_tpu.services.embedding_service import EmbeddingService
from vector_db_tpu.services.embedding_client import (
    EmbeddingClient,
    SyncEmbeddingClient,
)

__all__ = [
    "StorageService",
    "IndexingService",
    "EmbeddingService",
    "EmbeddingClient",
    "SyncEmbeddingClient",
]
