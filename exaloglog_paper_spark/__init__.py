"""exaloglog_paper_spark — a from-scratch PySpark-native distributed sketch
and approximate-aggregation library (ExaLogLog, HyperLogLog, count-min, KLL,
t-digest, Bloom) built as mergeable binary-state aggregators on vectorized
Arrow/pandas UDFs. Reference behavior: dynatrace-research/exaloglog-paper
(EDBT'25 artifact); architecture: idiomatic Spark DataFrame pipelines.
"""

__version__ = "0.1.0"
