from .catalog import TABLES, Catalog, load_table

__all__ = ["Catalog", "TABLES", "load_table"]
