from extractthinker_spark.streaming.ingest import (
    run_stream_once,
    stream_documents,
    stream_extract,
)

__all__ = ["stream_documents", "stream_extract", "run_stream_once"]
