from bulkfhirloader_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    similarity,
    skew,
    stats,
    text,
    windows,
)
