from record_matcher_spark.sources.checkpoints import StageStore

__all__ = ["StageStore"]
