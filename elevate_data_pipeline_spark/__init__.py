"""elevate_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference engine
``Vivek-M-08/elevate-data-pipeline`` (a metadata-driven batch ETL engine,
see /root/reference) using idiomatic PySpark: DataFrame/SQL plans compiled
from declarative specs, Catalyst doing the optimization, and Structured
Streaming / Pandas UDFs for the pieces plain SQL can't express.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, shuffle partitions, Arrow)
- ``sources``    : parquet catalog (primary), JDBC compat source/sink
- ``spec``       : the reference's JSON "script spec" query language as
                   validated dataclasses (input_data_schema / data_mapping /
                   output_data_schema — reference mentoringExecution2.scala:34-36)
- ``plans``      : spec -> DataFrame compiler. Decorrelates the reference's
                   per-ID driver loop (mentoringFunction2.scala:41-55) into
                   joins; per-ID compat mode kept for A/B semantics tests.
- ``functions``  : scalar/text/vector helpers (all JVM-side pyspark.sql.functions)
- ``operators``  : large-scale training-data ops — dedup (exact/minhash/simhash/
                   ngram/embedding), similarity search, multimodal plumbing
- ``streaming``  : Structured Streaming over the events table
"""

__version__ = "0.1.0"
