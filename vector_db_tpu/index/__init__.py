from vector_db_tpu.index.flat import FlatIndex
from vector_db_tpu.index.hnsw import HNSW
from vector_db_tpu.index.ivf import IvfIndex
from vector_db_tpu.index.pq import PQCodec, ProductQuantizationService

__all__ = [
    "FlatIndex",
    "HNSW",
    "IvfIndex",
    "PQCodec",
    "ProductQuantizationService",
]
