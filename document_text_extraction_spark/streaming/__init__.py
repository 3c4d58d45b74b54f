from .sessions import streaming_sessionize  # noqa: F401
from .windows import streaming_windowed_counts  # noqa: F401
from .stream import (  # noqa: F401
    extraction_stream,
    run_stream_available_now,
)
