from .channels import dedup_turns, derive_channels  # noqa: F401
from .features import features_from_turns, finalize_features  # noqa: F401
from .rollup import rollup_merge, cascade  # noqa: F401
