from ahrd_spark.streaming.pipeline import (  # noqa: F401
    stream_mention_detect,
    windowed_event_counts,
)
