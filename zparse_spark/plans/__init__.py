from zparse_spark.plans.engine import ValidationEngine, ValidationConfig, ValidationResult  # noqa: F401
from zparse_spark.plans.manifest import Manifest  # noqa: F401
