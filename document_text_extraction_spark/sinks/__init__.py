from .wet import write_wet, wet_text_df  # noqa: F401
