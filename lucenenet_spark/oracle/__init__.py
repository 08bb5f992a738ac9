from lucenenet_spark.oracle.pyoracle import PyIndex

__all__ = ["PyIndex"]
