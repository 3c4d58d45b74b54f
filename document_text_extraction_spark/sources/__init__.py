from .web_pages import (  # noqa: F401
    synth_web_pages,
    web_pages_from_documents,
    WEB_PAGES_SCHEMA,
)
from .warc import (  # noqa: F401
    make_warc,
    parse_warc,
    warc_pages_df,
)
