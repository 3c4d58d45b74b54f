from .stream import (  # noqa: F401
    extraction_stream,
    run_stream_available_now,
)
