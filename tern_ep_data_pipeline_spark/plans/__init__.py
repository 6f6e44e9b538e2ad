from .l1 import condition_events  # noqa: F401
