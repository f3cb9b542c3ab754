from bulkfhirloader_spark.functions import scalars

__all__ = ["scalars"]
