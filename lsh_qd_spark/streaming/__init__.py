from lsh_qd_spark.streaming.facade import StreamDedup, stream_dedup

__all__ = ["StreamDedup", "stream_dedup"]
