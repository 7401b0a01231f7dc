"""Validated dataclasses for the engine's script-spec query language.

The reference drives everything from three JSON columns of a Postgres
``config_table`` row (task/mentoringExecution2.scala:19,34-36):

- ``input_data_schema`` — array of scripts, each ``{fetchId, tasks:[...]}``
  where a task is ``single_process`` (functions/mentoringFunction2.scala:100-112)
  or ``fetchID_with_InputID`` + ``child:[multiple_process]``
  (functions/mentoringFunction1.scala:104-105,217-228);
- ``data_mapping`` — derived-column rules (mentoringFunction2.scala:210-237);
- ``output_data_schema`` — output projection/rename/type-gate rules
  (mentoringFunction2.scala:239-266).

This module is the same capability surface as typed Python. Differences
from the reference, by design (SURVEY.md §2.8):

- Task queries are **set-level** SQL over catalog views and carry a
  ``correlate_on`` column instead of an interpolated ``${id}`` placeholder;
  the compiler decorrelates to a join. A ``${id}`` template is still
  accepted for compat mode (reference operator S2,
  mentoringFunction2.scala:158).
- Aggregate names are validated against an allowlist (the reference passes
  any string into ``expr(s"$agg($col)")`` — mentoringFunction0.scala:121).
- Output type mismatches raise in strict mode instead of silently skipping
  the rename (mentoringFunction2.scala:255-262).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Union

# Aggregates the spec may name dynamically (reference A1 accepts any string;
# we allowlist to prevent spec-injection — SURVEY.md §7 "What's hard").
ALLOWED_AGGREGATES = frozenset(
    {
        "count",
        "sum",
        "avg",
        "mean",
        "min",
        "max",
        "first",
        "last",
        "stddev",
        "stddev_samp",
        "stddev_pop",
        "variance",
        "var_samp",
        "var_pop",
        "collect_set",
        "collect_list",
        "approx_count_distinct",
        "count_distinct",
        "sum_distinct",
    }
)

# Output type names the reference's type gate understands
# (mentoringFunction2.scala:253-257).
OUTPUT_TYPE_NAMES = {
    "IntegerType": "int",
    "LongType": "bigint",
    "StringType": "string",
    "DoubleType": "double",
    "FloatType": "float",
    "BooleanType": "boolean",
    "DateType": "date",
    "TimestampType": "timestamp",
    "ArrayType(StringType,true)": "array<string>",
}


class SpecError(ValueError):
    """Invalid spec content."""


@dataclass
class FetchId:
    """Driver query producing the ID list (reference J4,
    mentoringFunction2.scala:66-91)."""

    query: str
    id: str
    database_name: str = ""


@dataclass
class AggSpec:
    """One aggregate of a multi-aggregate task (engine extension)."""

    agg: str
    agg_on: str
    rename: str | None = None

    def __post_init__(self) -> None:
        if self.agg not in ALLOWED_AGGREGATES:
            raise SpecError(f"aggregate {self.agg!r} not in allowlist")

    @property
    def out_name(self) -> str:
        return self.rename or f"{self.agg}_{self.agg_on}"


_WINDOW_RANKING = frozenset({"row_number", "rank", "dense_rank", "percent_rank",
                             "cume_dist"})
_WINDOW_OFFSET = frozenset({"lag", "lead"})
_WINDOW_AGG = frozenset({"sum", "avg", "min", "max", "count"})


@dataclass
class WindowFnSpec:
    """One windowed column: a ranking function, a lag/lead offset, or a
    (rolling) aggregate over the partition."""

    fn: str
    out: str
    col: str | None = None
    offset: int = 1  # lag/lead distance
    rows_preceding: int | None = None  # rolling frame: N rows back..current

    def __post_init__(self) -> None:
        import re as _re

        if self.fn not in _WINDOW_RANKING | _WINDOW_OFFSET | _WINDOW_AGG:
            raise SpecError(f"window fn {self.fn!r} not in allowlist")
        if not _re.fullmatch(r"\w+", self.out):
            raise SpecError(f"bad window output name {self.out!r}")
        if self.fn in _WINDOW_OFFSET | _WINDOW_AGG:
            if not self.col or not _re.fullmatch(r"\w+", self.col):
                raise SpecError(f"window fn {self.fn!r} needs a source col")
        if self.fn in _WINDOW_RANKING and self.rows_preceding is not None:
            raise SpecError(f"window fn {self.fn!r} takes no frame")
        if not isinstance(self.offset, int) or self.offset < 0:
            raise SpecError("window offset must be a non-negative int")
        if self.rows_preceding is not None and (
            not isinstance(self.rows_preceding, int) or self.rows_preceding < 0
        ):
            raise SpecError("rows_preceding must be a non-negative int")


@dataclass
class WindowSpec:
    """Engine extension: declarative window block on a task — the
    per-partition concern the reference's task language cannot express
    (a real user's "top 3 sessions per mentor"). ``select`` adds
    windowed columns; ``top_n`` keeps the first N rows per partition in
    ``order_by`` order (compiled as a row_number filter, which Spark
    executes with WindowGroupLimit pushdown — per-partition top-N, no
    global sort). Offset/ranking/rolling functions need ``order_by``."""

    partition_by: list[str]
    order_by: list[str] = field(default_factory=list)
    select: list[WindowFnSpec] = field(default_factory=list)
    top_n: int | None = None

    def __post_init__(self) -> None:
        import re as _re

        if not self.partition_by:
            raise SpecError("window needs at least one partition_by column")
        for c in self.partition_by:
            if not _re.fullmatch(r"\w+", c):
                raise SpecError(f"bad window partition_by column {c!r}")
        for entry in self.order_by:
            if not _re.fullmatch(r"\w+( (?i:asc|desc))?", entry):
                raise SpecError(
                    f"bad window order_by entry {entry!r} "
                    "(want 'col' or 'col asc|desc')"
                )
        if self.top_n is not None and (
            not isinstance(self.top_n, int) or self.top_n <= 0
        ):
            raise SpecError("window top_n must be a positive int")
        needs_order = self.top_n is not None or any(
            f.fn in _WINDOW_RANKING | _WINDOW_OFFSET or f.rows_preceding is not None
            for f in self.select
        )
        if needs_order and not self.order_by:
            raise SpecError(
                "window with ranking/offset/rolling functions or top_n "
                "needs order_by"
            )
        if not self.select and self.top_n is None:
            raise SpecError("window block does nothing (no select, no top_n)")


@dataclass
class SingleProcess:
    """One task: scan → fill → (agg) → tag → fold-join
    (reference mentoringFunction2.scala:147-207)."""

    input: str  # task name; also the tag-column name in the reference (P3)
    query: str
    database_name: str = ""
    agg: str | None = None
    agg_on: str | None = None
    groupby: str | None = None
    join_on: Union[str, list, None] = None
    join_type: str | None = None
    rename: str | None = None
    # Column in the task-query result correlating rows to fetchId IDs.
    # None => uncorrelated task (whole-frame join/replace).
    correlate_on: str | None = None
    # Reference S4: empty per-ID result => one default row {agg_on: 0}
    # (mentoringFunction2.scala:168-175). Compiled as left-join + coalesce.
    default_on_empty: bool = True
    # Reference P4 always casts agg_on to integer (mentoringFunction2.scala:165);
    # here opt-in to avoid silent truncation.
    agg_cast: str | None = None
    # Engine extension: N aggregates over ONE scan. The reference needs N
    # single-agg tasks (N scans + N shuffles of the same source,
    # mentoringFunction2.scala:115-143); ``aggs`` fuses them into one
    # groupBy. Mutually exclusive with ``agg``.
    aggs: list[AggSpec] | None = None
    # Engine extension: boolean SQL predicate applied between the scan
    # and the aggregate. The reference can only filter by editing the
    # task's SQL string; a declarative ``where`` keeps the predicate
    # visible to spec tooling and lets Catalyst push it into the scan.
    where: str | None = None
    # Engine extension: boolean SQL predicate over the aggregate's
    # output (use the renamed aggregate columns), applied right after
    # the groupBy — a declarative HAVING.
    having: str | None = None
    # Engine extension: declarative top-N over the task's (aggregated)
    # result — ``order_by`` entries are "col" or "col desc"; with
    # ``limit`` Spark plans TakeOrderedAndProject (per-partition top-N +
    # single merge, never a global sort). Uncorrelated tasks only: a
    # per-ID top-N is a window concern, not a task-level one.
    order_by: list[str] | None = None
    limit: int | None = None
    # Engine extension: declarative per-partition window block (ranking /
    # lag-lead / rolling aggregates / top-N) applied after the task's
    # aggregate+having — see :class:`WindowSpec`.
    window: "WindowSpec | None" = None

    def __post_init__(self) -> None:
        if self.aggs is not None and self.agg is not None:
            raise SpecError(f"task {self.input!r}: use either agg or aggs, not both")
        if self.order_by is not None:
            import re as _re

            for entry in self.order_by:
                if not _re.fullmatch(r"\w+( (?i:asc|desc))?", entry):
                    raise SpecError(
                        f"task {self.input!r}: bad order_by entry {entry!r} "
                        "(want 'col' or 'col asc|desc')"
                    )
        if self.limit is not None and (
            not isinstance(self.limit, int) or self.limit <= 0
        ):
            raise SpecError(f"task {self.input!r}: limit must be a positive int")
        if (self.order_by or self.limit) and self.correlate_on:
            raise SpecError(
                f"task {self.input!r}: order_by/limit apply to uncorrelated "
                "tasks only (per-ID top-N is a window operation)"
            )
        if self.agg is not None:
            if self.agg not in ALLOWED_AGGREGATES:
                raise SpecError(f"aggregate {self.agg!r} not in allowlist")
            if not self.agg_on:
                raise SpecError(f"task {self.input!r}: agg={self.agg!r} needs agg_on")


@dataclass
class NestedFetch:
    """fetchID_with_InputID: bridge query mapping outer IDs to inner IDs,
    children aggregated per inner ID then rolled up per outer ID
    (reference J5/A2/U1, mentoringFunction1.scala:201-274,328-376)."""

    query: str  # must yield (correlate_on, id) pairs
    id: str
    correlate_on: str
    join_on: Union[str, list, None]
    join_type: str | None
    child: list[SingleProcess] = field(default_factory=list)
    database_name: str = ""
    input: str = "nested"


Task = Union[SingleProcess, NestedFetch]


@dataclass
class Script:
    """One pipeline: fetchId + ordered tasks folding into an accumulator
    (reference processScriptLevelData, mentoringFunction2.scala:30-63)."""

    fetch_id: FetchId | None
    tasks: list[Task]
    name: str = "script"


@dataclass
class MappingRule:
    """data_mapping entry: "none" or row-wise n-ary derived column.

    The reference implements only ``average`` over exactly 2 columns,
    rounded to 2dp (mentoringFunction2.scala:220-228); we generalize to
    n-ary average/sum/min/max with configurable rounding.
    """

    agg_type: str  # "none" | "average" | "sum" | "min" | "max"
    column_name: list[str] = field(default_factory=list)
    round_to: int = 2

    def __post_init__(self) -> None:
        if self.agg_type not in {"none", "average", "sum", "min", "max"}:
            raise SpecError(f"mapping agg_type {self.agg_type!r} unsupported")
        if self.agg_type != "none" and len(self.column_name) < 1:
            raise SpecError("mapping rule needs at least one source column")


@dataclass
class OutputColumn:
    """output_data_schema entry: declared type + sink rename
    (reference mentoringFunction2.scala:249-262)."""

    input_data_type: str
    rename: str

    def __post_init__(self) -> None:
        if self.input_data_type not in OUTPUT_TYPE_NAMES:
            raise SpecError(f"unknown output type {self.input_data_type!r}")


@dataclass
class PipelineSpec:
    """The full three-part spec (one config_table row)."""

    scripts: list[Script]
    data_mapping: dict[str, MappingRule] = field(default_factory=dict)
    output_schema: dict[str, OutputColumn] = field(default_factory=dict)
    script_type: str = ""
