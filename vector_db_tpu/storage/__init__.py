from vector_db_tpu.storage.base import NodeStorage
from vector_db_tpu.storage.memory import InMemoryNodeStorage
from vector_db_tpu.storage.mmap import MMapNodeStorage

__all__ = ["NodeStorage", "InMemoryNodeStorage", "MMapNodeStorage"]
