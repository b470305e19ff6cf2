"""open_thoughts_spark — a PySpark-native data-curation / quality-filter engine.

A from-scratch reimplementation of the capabilities of the Open Thoughts
curation pipelines (reference: banerRana/open-thoughts) as idiomatic PySpark:
DataFrame/SQL logical plans optimized by Catalyst, vectorized Arrow/pandas UDFs
only where built-in operators cannot express the semantics (model scoring),
and explicit partitioning/skew handling designed for 10^12-turn scale.

Layout
------
- ``session``    — SparkSession builder with scale-tuned defaults (AQE, Arrow).
- ``fixtures``   — deterministic distributed synthetic transcripts generator.
- ``rules``      — heuristic quality rules + boilerplate phrase lists + PII scrub.
- ``functions``  — language ID, n-gram perplexity, text statistics.
- ``operators``  — dedup (exact/MinHash-LSH/SimHash/Jaccard), similarity search,
                   decontamination, sampling, relational building blocks.
- ``pipeline``   — the end-to-end quality-filter pipeline + metrics + lineage +
                   stage-hash checkpointing (resume).
- ``oracle``     — single-process pandas implementation of the exact rule
                   semantics, used by tests as the golden reference.
"""

__version__ = "0.1.0"
