from lucenenet_spark.analysis.analyzers import (
    ENGLISH_STOP_WORDS,
    StandardAnalyzer,
    WhitespaceAnalyzer,
    tokenize_batch,
)

__all__ = [
    "ENGLISH_STOP_WORDS",
    "StandardAnalyzer",
    "WhitespaceAnalyzer",
    "tokenize_batch",
]
