"""Config-table spec loading — reference operator S3.

The reference reads its spec from a Postgres row:
``SELECT * FROM $table_name WHERE script_type = '$script_type'``
(task/mentoringExecution2.scala:19,28) and pulls the three JSON documents
with ``.first()`` (A5 scalar extraction, ibid:34-36). Here the config
table is any DataFrame (parquet/JDBC/in-memory) with columns
``script_type, input_data_schema, data_mapping, output_data_schema``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import PipelineSpec, SpecError
from .parser import parse_spec

CONFIG_COLUMNS = ("input_data_schema", "data_mapping", "output_data_schema")


def load_spec_from_config(config_df: DataFrame, script_type: str) -> PipelineSpec:
    """Select the config row for ``script_type`` and parse its three spec
    documents. Parameterized filter — not the reference's string-
    interpolated SQL (SURVEY.md §2.8.5)."""
    row = (
        config_df.filter(F.col("script_type") == script_type)
        .select(*[c for c in CONFIG_COLUMNS if c in config_df.columns])
        .first()
    )
    if row is None:
        raise SpecError(f"no config row with script_type={script_type!r}")
    d = row.asDict()
    return parse_spec(
        d.get("input_data_schema"),
        d.get("data_mapping"),
        d.get("output_data_schema"),
        script_type=script_type,
    )
