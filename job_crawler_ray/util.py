"""Small shared batch utilities."""

from __future__ import annotations

import pyarrow as pa


def strip_meta(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata from an Arrow batch.

    pyarrow Schemas carrying ``b'pandas'`` metadata are UNHASHABLE in
    this pyarrow version (hashing the schema hashes the decoded
    metadata, which contains a dict) — Ray Data's schema deduplication
    then logs ``Failed to hash the schemas`` on every reduce task.
    Blocks converted from pandas (``batch_format="pandas"`` stages,
    ``Table.from_pandas``) and pandas-written parquet files all carry
    it. Used as the arrow-normalization pass after pandas-format stages
    and directly after parquet reads.
    """
    return t.replace_schema_metadata(None) if t.schema.metadata else t
