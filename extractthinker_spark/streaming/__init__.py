from extractthinker_spark.streaming.ingest import (
    run_raw_stream_once,
    run_stream_once,
    stream_documents,
    stream_extract,
    stream_raw_documents,
)

__all__ = [
    "stream_documents",
    "stream_extract",
    "stream_raw_documents",
    "run_stream_once",
    "run_raw_stream_once",
]
