"""Dataset ingestion — the Spark-first analogue of ``fuel.datasets``.

fuel Datasets (reference ``fuel/datasets/base.py:14``) are named tuples
of sources with stateful open/get_data; here a dataset is simply a
DataFrame whose *columns* are the sources, read lazily from columnar
storage so scans prune and push down.
"""

from fuel_spark.sources.tables import TABLE_NAMES, load_table, load_tables
from fuel_spark.sources.memory import from_rows
from fuel_spark.sources.splits import SplitDataset
from fuel_spark.sources.jsonl import (
    corrupt_split,
    read_csv_corpus,
    read_jsonl_corpus,
    write_jsonl,
)
from fuel_spark.sources.text import (
    build_dictionary,
    dictionary_encode,
    dictionary_from_mapping,
    read_text_lines,
)
from fuel_spark.sources.formats import (
    quarantine_split,
    read_tar_corpus,
    read_text_corpus,
)
from fuel_spark.sources.toy import spiral, swiss_roll

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "from_rows",
    "read_jsonl_corpus",
    "read_csv_corpus",
    "corrupt_split",
    "write_jsonl",
    "SplitDataset",
    "build_dictionary",
    "dictionary_encode",
    "dictionary_from_mapping",
    "read_text_lines",
    "read_text_corpus",
    "read_tar_corpus",
    "quarantine_split",
    "spiral",
    "swiss_roll",
]
