"""semantic_log_detector_spark — a from-scratch PySpark-native validation engine.

Re-expresses the query/data-processing capabilities of the reference repo
``srinivaskokkula1234/semantic-log-detector`` (see SURVEY.md) as a declarative
schema + constraint validation engine over tables of audio clip + transcript
pairs, plus a library of general-purpose Spark operators (dedup, similarity
search, text analysis) for large-scale training-data pipelines.

Design: DataFrame/Catalyst-first. All hot paths are built-in pyspark.sql
functions (JVM, whole-stage codegen); Python appears only in vectorized
pandas/Arrow UDFs (audio decode + feature extraction). No RDDs, no per-row
Python, no driver-side loops over data.
"""

__version__ = "0.1.0"
