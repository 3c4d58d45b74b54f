from .sessions import streaming_sessionize  # noqa: F401
from .windows import (  # noqa: F401
    streaming_dedup,
    streaming_windowed_counts,
)
from .stream import (  # noqa: F401
    extraction_stream,
    run_stream_available_now,
)
