from zparse_spark.streaming.validate_stream import (  # noqa: F401
    validate_stream,
    violation_rate_windows,
)
