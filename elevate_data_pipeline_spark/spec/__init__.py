from .model import (
    FetchId,
    MappingRule,
    NestedFetch,
    OutputColumn,
    PipelineSpec,
    Script,
    SingleProcess,
)
from .parser import parse_spec

__all__ = [
    "FetchId",
    "MappingRule",
    "NestedFetch",
    "OutputColumn",
    "PipelineSpec",
    "Script",
    "SingleProcess",
    "parse_spec",
]
