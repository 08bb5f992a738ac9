from lucenenet_spark.queryparser.flexible import (
    MultiFieldQueryParser,
    StandardQueryParser,
)
from lucenenet_spark.queryparser.parser import QueryParser

__all__ = ["MultiFieldQueryParser", "QueryParser", "StandardQueryParser"]
