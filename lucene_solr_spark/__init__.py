"""lucene_solr_spark — a PySpark-native inverted-index + BM25 query engine.

A from-scratch reimplementation of the query/data-processing capabilities of
Apache Lucene/Solr (reference: markrmiller/lucene-solr, Lucene 9.0.0-SNAPSHOT)
as an idiomatic Spark engine:

- analysis chains (code-aware tokenization) as vectorized Arrow UDFs
- per-partition immutable index segments: docID-delta VByte-compressed
  postings with per-128-doc block-max metadata, SmallFloat norms
- TieredMergePolicy-style segment merging with docID remap + hot-term salting
- term / boolean / phrase queries scored with BM25(k1=1.2, b=0.75),
  rank-identical to Lucene (float32 score parity), block-max pruning
- a relational operator surface mirroring Solr streaming expressions,
  expressed directly in DataFrame/Catalyst ops

No code is copied from the reference; semantics are cited per-module as
``reference file:line``.
"""

__version__ = "0.1.0"
