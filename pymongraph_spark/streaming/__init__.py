from pymongraph_spark.streaming.stateful import running_user_stats
from pymongraph_spark.streaming.dedup import deduped_event_stream

__all__ = ["running_user_stats", "deduped_event_stream"]
