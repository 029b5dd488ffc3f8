from .generator import (  # noqa: F401
    build_corpus,
    build_doc,
    doc_text,
    entity_dict_rows,
    pages_rows,
    render_html,
)
