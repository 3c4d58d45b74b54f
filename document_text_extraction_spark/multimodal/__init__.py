from .media import (  # noqa: F401
    MEDIA_FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    extract_media_features,
    frame_sample_plan,
    sniff_media_col,
    synth_media_rows,
)
