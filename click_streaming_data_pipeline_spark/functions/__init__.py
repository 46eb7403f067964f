from .quality import quality_check_columns, QUALITY_WEIGHTS
from .scalars import uuid7_deterministic, utf8_bytes, truncate_content

__all__ = [
    "quality_check_columns",
    "QUALITY_WEIGHTS",
    "uuid7_deterministic",
    "utf8_bytes",
    "truncate_content",
]
