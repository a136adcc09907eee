"""concepts_pipeline_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the data-processing capabilities of the reference
``wellcomecollection/concepts-pipeline`` (three Pekko-Streams services bulk/CDC-upserting
into Elasticsearch) as an idiomatic Spark engine:

- ``lake``       — a minimal ACID snapshot table format on parquet (manifests, atomic
                   commits, bucketed copy-on-write MERGE, schema evolution, fencing).
                   Stands in for the Elasticsearch indices of the reference
                   (ref: common/src/main/scala/weco/concepts/common/elasticsearch/*).
- ``cdc``        — change-log generator + the batch apply pipeline
                   (validate -> quarantine -> LWW over LSN -> MERGE -> lineage),
                   the analogue of aggregator/ConceptsAggregator.scala + BulkUpdateFlow.
- ``streaming``  — Structured Streaming foreachBatch driver with checkpoint +
                   batch-id fencing (exactly-once apply).
- ``operators``  — reusable DataFrame operators: LWW dedup, anti-join pruning,
                   merge classification, near-duplicate detection (minhash/simhash/
                   ngram/embedding), ANN similarity, text stats, multimodal plumbing.
"""

__version__ = "0.1.0"
