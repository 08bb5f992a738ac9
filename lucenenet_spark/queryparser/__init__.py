from lucenenet_spark.queryparser.parser import QueryParser

__all__ = ["QueryParser"]
