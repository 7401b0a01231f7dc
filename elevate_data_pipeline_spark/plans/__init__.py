from .compiler import compile_pipeline, compile_script
from .compat import run_per_id

__all__ = ["compile_pipeline", "compile_script", "run_per_id"]
