from easyner_spark.streaming.pipeline import (
    incremental_kg,
    stateful_crawl_delta,
    stateful_first_seen,
    stateful_kmv_distinct,
    stream_events,
    stream_pages,
    streaming_sessions,
    windowed_mention_rates,
)

__all__ = [
    "incremental_kg",
    "stateful_crawl_delta",
    "stateful_first_seen",
    "stateful_kmv_distinct",
    "stream_events",
    "stream_pages",
    "streaming_sessions",
    "windowed_mention_rates",
]
