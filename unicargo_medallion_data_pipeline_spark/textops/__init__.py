"""Training-data-pipeline operators: text analysis, dedup (exact / MinHash-
LSH / SimHash / n-gram Jaccard), embedding similarity search, multimodal
column plumbing.

These go beyond the reference's surface (BASELINE.json north star): the
reference is a flight-analytics medallion pipeline; a 100 TB training-data
lake additionally needs document hygiene and similarity primitives.  All
hot paths are built-in Column expressions / higher-order array functions
(JVM, codegen); Python appears only in clearly-marked multimodal stubs.
"""
