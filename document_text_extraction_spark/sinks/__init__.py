from .wet import write_wet, wet_text_df  # noqa: F401
from .wat import write_wat, wat_links_df  # noqa: F401
