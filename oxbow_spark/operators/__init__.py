from oxbow_spark.operators.interval_join import overlap_join
from oxbow_spark.operators.zoom import zoom_aggregate

__all__ = ["overlap_join", "zoom_aggregate"]
