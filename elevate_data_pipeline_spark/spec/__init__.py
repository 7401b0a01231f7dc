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
from .config import load_spec_from_config

__all__ = [
    "FetchId",
    "MappingRule",
    "NestedFetch",
    "OutputColumn",
    "PipelineSpec",
    "Script",
    "SingleProcess",
    "parse_spec",
    "load_spec_from_config",
]
