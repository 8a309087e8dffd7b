from vector_db_tpu.api.models import (
    InsertRequest,
    InsertResponse,
    QueryRequest,
    QueryResponse,
)

__all__ = ["InsertRequest", "InsertResponse", "QueryRequest", "QueryResponse"]
