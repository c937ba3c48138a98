from .transcripts import read_transcripts, resolve_snapshot  # noqa: F401
from .sinks import write_tier  # noqa: F401
