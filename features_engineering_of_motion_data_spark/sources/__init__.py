from .transcripts import read_transcripts, resolve_snapshot  # noqa: F401
from .sinks import apply_retention, compact, expire, list_snapshots, read_tier, register_tier_views, write_tier  # noqa: F401
