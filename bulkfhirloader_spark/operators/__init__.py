from bulkfhirloader_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    similarity,
    stats,
    text,
    windows,
)
