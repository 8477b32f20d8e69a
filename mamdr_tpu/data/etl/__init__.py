from mamdr_tpu.data.etl.common import RawId2Id, split_domains

__all__ = ["RawId2Id", "split_domains"]
