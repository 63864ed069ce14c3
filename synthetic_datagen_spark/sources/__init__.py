from .registry import Catalog, load_table, load_csv_series, load_multiple_csv, save_csv

__all__ = ["Catalog", "load_table", "load_csv_series", "load_multiple_csv", "save_csv"]
