from . import distances, stats, text, timeseries, vectors

__all__ = ["distances", "stats", "text", "timeseries", "vectors"]
