from lucenenet_spark.index.builder import InvertedIndex, assign_doc_ids, build_index
from lucenenet_spark.index.smallfloat import (
    bm25_norm_cache,
    byte315_to_float,
    encode_norm,
    float_to_byte315,
    norm_table,
)

__all__ = [
    "InvertedIndex",
    "build_index",
    "assign_doc_ids",
    "float_to_byte315",
    "byte315_to_float",
    "encode_norm",
    "norm_table",
    "bm25_norm_cache",
]
