from zparse_spark.sources.interleave import interleave_documents, derive_media_catalog  # noqa: F401
from zparse_spark.sources.readers import load_table, load_documents  # noqa: F401
