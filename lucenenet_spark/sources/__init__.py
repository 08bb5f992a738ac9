"""Content sources: benchmark-format readers/writers
(reference: src/Lucene.Net.Benchmark/ByTask/Feeds/)."""

from lucenenet_spark.sources.warc import read_wet, write_wet
from lucenenet_spark.sources.linedoc import (
    read_enwiki,
    read_geonames,
    read_reuters,
    read_linedoc,
    read_trec,
    write_linedoc,
)

__all__ = ["read_linedoc", "write_linedoc", "read_trec", "read_enwiki", "read_reuters", "read_geonames", "read_wet", "write_wet"]
