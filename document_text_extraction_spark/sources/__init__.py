from .web_pages import (  # noqa: F401
    synth_web_pages,
    web_pages_from_documents,
    WEB_PAGES_SCHEMA,
)
