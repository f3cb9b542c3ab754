from bulkfhirloader_spark.operators import (  # noqa: F401
    curation,
    dedup,
    joins,
    multimodal,
    profile,
    similarity,
    skew,
    stats,
    text,
    windows,
)
