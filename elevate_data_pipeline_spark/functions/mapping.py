"""data_mapping (derived columns) and output_data_schema (projection /
type gate / rename) stages.

Reference semantics:
- dataMappingProcess (mentoringFunction2.scala:210-237): for each mapping
  entry whose column is absent from the frame, compute a row-wise derived
  column; only ``average`` over exactly two columns, rounded to 2dp, is
  implemented there (``round((col(c1)+col(c2))/2, 2)``, line 220-228).
  Generalized here to n-ary average/sum/min/max.
- outputMappingProcess (mentoringFunction2.scala:239-266): select the spec'd
  columns (P1), string-compare each column's type to the declared
  ``Input_data_type`` (P6), flatten ``ArrayType(StringType,true)`` via
  ``concat_ws(", ", col)`` (line 256-257), then rename (P2). On type
  mismatch the reference silently keeps the column un-renamed (line
  260-262); here strict mode raises, lenient mode reproduces the
  reference's pass-through.
"""

from __future__ import annotations

import functools
import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..spec.model import MappingRule, OutputColumn, SpecError

log = logging.getLogger(__name__)


def _rowwise(rule: MappingRule) -> F.Column:
    cols = [F.col(c) for c in rule.column_name]
    if rule.agg_type == "average":
        expr = functools.reduce(lambda a, b: a + b, cols) / F.lit(len(cols))
    elif rule.agg_type == "sum":
        expr = functools.reduce(lambda a, b: a + b, cols)
    elif rule.agg_type == "min":
        expr = F.least(*cols) if len(cols) > 1 else cols[0]
    elif rule.agg_type == "max":
        expr = F.greatest(*cols) if len(cols) > 1 else cols[0]
    else:  # pragma: no cover - validated upstream
        raise SpecError(f"unsupported agg_type {rule.agg_type!r}")
    return F.round(expr, rule.round_to)


def apply_data_mapping(df: DataFrame, mapping: dict[str, MappingRule]) -> DataFrame:
    """Add derived columns per the data_mapping rules.

    Matches the reference's guard: a rule only fires when the target column
    is NOT already present (mentoringFunction2.scala:216-219).
    """
    existing = set(df.columns)
    for name, rule in mapping.items():
        if rule.agg_type == "none" or name in existing:
            continue
        missing = [c for c in rule.column_name if c not in existing]
        if missing:
            raise SpecError(f"data_mapping {name!r}: source columns missing {missing}")
        df = df.withColumn(name, _rowwise(rule))
        existing.add(name)
    return df


def apply_output_mapping(
    df: DataFrame,
    output_schema: dict[str, OutputColumn],
    strict: bool = True,
) -> DataFrame:
    """Project to the declared output columns, gate types, flatten string
    arrays, and rename for the sink."""
    if not output_schema:
        return df
    missing = [c for c in output_schema if c not in df.columns]
    if missing:
        raise SpecError(f"output_data_schema references missing columns {missing}")

    df = df.select(*output_schema.keys())
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}

    from ..spec.model import OUTPUT_TYPE_NAMES

    renames: dict[str, str] = {}
    for name, spec in output_schema.items():
        declared = OUTPUT_TYPE_NAMES[spec.input_data_type]
        if spec.input_data_type == "ArrayType(StringType,true)":
            if actual[name] != "array<string>":
                if strict:
                    raise SpecError(
                        f"output column {name!r}: declared array<string>, "
                        f"actual {actual[name]}"
                    )
                log.warning("data_type_not_matches: %s (%s)", name, actual[name])
                continue
            df = df.withColumn(name, F.concat_ws(", ", F.col(name)))
            renames[name] = spec.rename
        elif actual[name] == declared:
            renames[name] = spec.rename
        elif strict:
            raise SpecError(
                f"output column {name!r}: declared {declared}, actual {actual[name]}"
            )
        else:
            # reference behavior: keep the column, skip the rename
            # (mentoringFunction2.scala:260-262)
            log.warning("data_type_not_matches: %s (%s)", name, actual[name])

    for old, new in renames.items():
        if old != new:
            df = df.withColumnRenamed(old, new)
    return df
