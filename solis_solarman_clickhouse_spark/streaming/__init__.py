"""Custom stateful Structured-Streaming operators (beyond the native
window/session/dedup surface in queries/streaming_batch.py)."""

from .stateful import streaming_counter_rate  # noqa: F401
