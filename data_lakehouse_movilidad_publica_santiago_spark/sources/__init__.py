"""Bronze/silver IO: pipe-CSV scans, parquet sinks, lake catalog."""

from .csv_source import read_pipe_csv
from .catalog import CutPartition, discover_partitions, write_meta

__all__ = ["read_pipe_csv", "CutPartition", "discover_partitions", "write_meta"]
