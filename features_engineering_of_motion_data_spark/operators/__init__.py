from .channels import dedup_turns, derive_channels  # noqa: F401
from .features import features_from_turns, finalize_features  # noqa: F401
from .rollup import cascade, rollup_merge, rollup_merge_calendar  # noqa: F401
