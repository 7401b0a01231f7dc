"""JSON -> spec-model parser.

Accepts the reference's on-disk JSON shape (the three config_table columns,
task/mentoringExecution2.scala:34-45) plus the new engine's extensions
(``correlate_on``, n-ary mapping rules). ``parse_spec`` takes either JSON
strings or already-decoded objects.
"""

from __future__ import annotations

import json
from typing import Any, Union

from .model import (
    AggSpec,
    FetchId,
    MappingRule,
    NestedFetch,
    OutputColumn,
    PipelineSpec,
    Script,
    SingleProcess,
    SpecError,
    WindowFnSpec,
    WindowSpec,
)


def _loads(value: Union[str, list, dict, None]) -> Any:
    if value is None:
        return None
    if isinstance(value, str):
        return json.loads(value)
    return value


def _parse_single(obj: dict) -> SingleProcess:
    known = {
        "input",
        "query",
        "database_name",
        "agg",
        "agg_on",
        "groupby",
        "join_on",
        "join_type",
        "rename",
        "correlate_on",
        "default_on_empty",
        "agg_cast",
        "aggs",
        "where",
        "having",
        "order_by",
        "limit",
        "window",
    }
    extra = set(obj) - known
    if extra:
        raise SpecError(f"single_process: unknown keys {sorted(extra)}")
    # The reference uses the literal string "none" as a null marker
    # (join-or-replace dispatch, mentoringFunction2.scala:124-135).
    clean = {k: (None if v == "none" else v) for k, v in obj.items()}
    # ...except join_on/join_type where "none" is semantically meaningful
    # (it selects the replace branch); keep the raw value there.
    for k in ("join_on", "join_type"):
        if k in obj:
            clean[k] = obj[k]
    if clean.get("aggs"):
        clean["aggs"] = [AggSpec(**a) for a in clean["aggs"]]
    if clean.get("window"):
        w = clean["window"]
        if not isinstance(w, dict):
            raise SpecError("window must be an object")
        # strict key validation, mirroring _parse_single's task-level
        # check: a typo like 'topn' or 'partitionby' must fail the spec,
        # not silently drop the clause.
        _w_extra = set(w) - {"partition_by", "order_by", "select", "top_n"}
        if _w_extra:
            raise SpecError(f"unknown window keys: {sorted(_w_extra)}")
        for f in w.get("select", []):
            if not isinstance(f, dict):
                raise SpecError("window select entries must be objects")
            _f_extra = set(f) - {"fn", "as", "out", "col", "offset", "rows_preceding"}
            if _f_extra:
                raise SpecError(f"unknown window fn keys: {sorted(_f_extra)}")
        fns = [
            WindowFnSpec(
                fn=f.get("fn", ""),
                out=f.get("as", f.get("out", "")),
                col=f.get("col"),
                offset=f.get("offset", 1),
                rows_preceding=f.get("rows_preceding"),
            )
            for f in w.get("select", [])
        ]
        clean["window"] = WindowSpec(
            partition_by=list(w.get("partition_by", [])),
            order_by=list(w.get("order_by", [])),
            select=fns,
            top_n=w.get("top_n"),
        )
    return SingleProcess(**clean)


def _parse_task(obj: dict) -> Union[SingleProcess, NestedFetch]:
    if "single_process" in obj:
        return _parse_single(obj["single_process"])
    if "fetchID_with_InputID" in obj:
        head = obj["fetchID_with_InputID"]
        children = [
            _parse_single(c["multiple_process"]) for c in obj.get("child", [])
        ]
        return NestedFetch(
            query=head["query"],
            id=head["id"],
            correlate_on=head.get("correlate_on", head["id"]),
            join_on=head.get("join_on"),
            join_type=head.get("join_type"),
            child=children,
            database_name=head.get("database_name", ""),
            input=head.get("input", "nested"),
        )
    raise SpecError(f"unknown task node: {sorted(obj)}")


def _parse_mapping_rule(value: Any) -> MappingRule:
    if value == "none" or value is None:
        return MappingRule(agg_type="none")
    if isinstance(value, dict) and "aggregation" in value:
        return _parse_mapping_rule(value["aggregation"])
    if isinstance(value, dict):
        return MappingRule(
            agg_type=value.get("agg_type", "none"),
            column_name=list(value.get("column_name", [])),
            round_to=int(value.get("round_to", 2)),
        )
    raise SpecError(f"bad data_mapping rule: {value!r}")


def parse_spec(
    input_data_schema: Union[str, list],
    data_mapping: Union[str, dict, None] = None,
    output_data_schema: Union[str, dict, None] = None,
    script_type: str = "",
) -> PipelineSpec:
    """Parse the three spec documents into a validated PipelineSpec."""
    scripts_raw = _loads(input_data_schema)
    if not isinstance(scripts_raw, list):
        raise SpecError("input_data_schema must be a JSON array of scripts")

    scripts: list[Script] = []
    for i, s in enumerate(scripts_raw):
        fetch = None
        if s.get("fetchId"):
            f = s["fetchId"]
            fetch = FetchId(
                query=f["query"], id=f["id"], database_name=f.get("database_name", "")
            )
        tasks = [_parse_task(t) for t in s.get("tasks", [])]
        scripts.append(Script(fetch_id=fetch, tasks=tasks, name=s.get("name", f"script_{i}")))

    mapping_raw = _loads(data_mapping) or {}
    mapping = {k: _parse_mapping_rule(v) for k, v in mapping_raw.items()}

    output_raw = _loads(output_data_schema) or {}
    output = {
        k: OutputColumn(
            input_data_type=v["Input_data_type"], rename=v.get("rename", k)
        )
        for k, v in output_raw.items()
    }
    return PipelineSpec(
        scripts=scripts,
        data_mapping=mapping,
        output_schema=output,
        script_type=script_type,
    )
