from .sql import register_sql_functions  # noqa: F401
from .text import (  # noqa: F401
    ABBREVIATIONS,
    RESULT_KEYWORDS,
    RESULT_LABELS,
    clean_thm,
    find_ref_results,
    find_thm_proof,
    find_thm_start,
    get_pattern,
    norm_title,
    normalize_text,
)
