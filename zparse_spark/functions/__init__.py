from zparse_spark.functions.inference import infer_cell_type, try_cast_cascade, parse_datetime_any, parse_int_any  # noqa: F401
from zparse_spark.functions.text import (  # noqa: F401
    token_count,
    quality_score,
    lang_guess,
    doc_fingerprint,
    validate_text_udf,
)
