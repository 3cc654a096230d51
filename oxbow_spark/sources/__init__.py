from oxbow_spark.sources.register import register_all

__all__ = ["register_all"]
