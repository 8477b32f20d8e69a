from mamdr_tpu.ops.embedding_lookup import embedding_lookup

__all__ = ["embedding_lookup"]
