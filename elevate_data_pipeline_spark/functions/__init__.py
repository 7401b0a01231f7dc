from .mapping import apply_data_mapping, apply_output_mapping

__all__ = ["apply_data_mapping", "apply_output_mapping"]
