from mapreduceimplementation_spark.sources.tables import TABLES, load_table, load_tables
from mapreduceimplementation_spark.sources.text import read_text_dir

__all__ = ["TABLES", "load_table", "load_tables", "read_text_dir"]
