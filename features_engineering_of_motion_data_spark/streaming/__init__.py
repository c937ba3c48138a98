from .rollup_stream import (  # noqa: F401
    stream_dedup_turns,
    stream_ewma,
    stream_latency_stateful,
    stream_sessions,
    stream_tier_1m,
)
