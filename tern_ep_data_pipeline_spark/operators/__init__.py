from . import (  # noqa: F401
    conditioning,
    dedup,
    gaps,
    masking,
    merge,
    regularise,
    reshape,
    similarity,
    status,
    text,
    windows,
)
