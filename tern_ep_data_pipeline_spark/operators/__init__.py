from . import (  # noqa: F401
    conditioning,
    dedup,
    gaps,
    masking,
    merge,
    multimodal,
    regularise,
    reshape,
    similarity,
    status,
    text,
    windows,
)
