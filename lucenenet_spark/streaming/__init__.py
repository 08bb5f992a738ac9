from lucenenet_spark.streaming.incremental import IncrementalIndexer

__all__ = ["IncrementalIndexer"]
