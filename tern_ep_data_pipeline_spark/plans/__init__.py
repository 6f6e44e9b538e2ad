from .curation import curate_corpus  # noqa: F401
from .l1 import condition_events  # noqa: F401
