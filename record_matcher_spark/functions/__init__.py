from record_matcher_spark.functions.scorers import (
    SCORERS,
    Scorer,
    blank_coalesce,
    register_scorer,
)

__all__ = ["SCORERS", "Scorer", "blank_coalesce", "register_scorer"]
