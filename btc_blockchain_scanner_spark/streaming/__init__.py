from .incremental import incremental_extract, hourly_event_counts  # noqa: F401
