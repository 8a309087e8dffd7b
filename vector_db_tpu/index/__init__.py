from vector_db_tpu.index.flat import FlatIndex
from vector_db_tpu.index.hnsw import HNSW

__all__ = ["FlatIndex", "HNSW"]
