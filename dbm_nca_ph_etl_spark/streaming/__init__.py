from dbm_nca_ph_etl_spark.streaming.messages import (
    RELEASE_BATCH_MSG_SCHEMA,
    RELEASE_MSG_SCHEMA,
    decode_messages,
    encode_messages,
)
from dbm_nca_ph_etl_spark.streaming.nca_stream import run_nca_pipeline
from dbm_nca_ph_etl_spark.streaming.events import (
    daily_active_users,
    daily_active_users_approx,
    session_window_stats,
    sliding_window_counts,
    tumbling_window_counts,
)

__all__ = [
    "RELEASE_BATCH_MSG_SCHEMA",
    "RELEASE_MSG_SCHEMA",
    "daily_active_users",
    "daily_active_users_approx",
    "decode_messages",
    "encode_messages",
    "run_nca_pipeline",
    "session_window_stats",
    "sliding_window_counts",
    "tumbling_window_counts",
]
