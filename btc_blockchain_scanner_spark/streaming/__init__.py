from .incremental import incremental_extract, hourly_event_counts  # noqa: F401
from .stateful import sessionize_stream  # noqa: F401
