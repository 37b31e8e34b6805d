"""datastream_io_spark — a PySpark-native full-text index + BM25 query engine.

Built from scratch per BASELINE.json's north rule (BASELINE.json:14): a
brand-new inverted-index build + BM25 query engine (posting-list
construction, merge, compression, top-k scoring) over source-code corpus
tables at large scale — NOT a port of the reference
(MentatInnovations/datastream.io, whose checkout at /root/reference is
empty; see SURVEY.md §0). The dsio heritage survives as the streaming
shape (restream → incremental stateful scoring → sink) in
``datastream_io_spark.streaming``.

Layout (SURVEY.md §2 operator inventory):
  functions/   tokenize (T1), bm25 scoring math (Q3)
  operators/   codec (C2/C3), postings (T2-T5, C1, C4), build (3.1, C6),
               merge (C5), search (Q1-Q8 incl. block-max WAND Q7),
               relational breadth ops (§2.6-2.9), dataprep (dedup/ANN/
               text-analysis for training-data pipelines)
  sources/     corpus/testdata/segment scans (S1/S2/S4), sinks (S3),
               manifest lineage (S5)
  streaming/   Structured Streaming ops (§2.10, ST1-ST8)
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128
