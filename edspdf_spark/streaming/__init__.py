from .pipeline import stream_pages  # noqa: F401
