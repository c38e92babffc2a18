"""Apache ORC source and sink — the second from-scratch Ray Datasource
on the §2.1 extension point (sibling of :mod:`ipcio`), for the other
columnar warehouse format Ray Data ships no reader for in this
version. ORC is what Hive/Trino-era lakes hold; an engine claiming
"switch your pipelines over" needs to ingest it in place.

Scale shape: the sink writes one ORC file per block (read parallelism
≡ write parallelism, resumable, no giant single file); each read task
iterates STRIPES — the ORC-native chunk — so a task never holds more
than one stripe beyond the current batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.orc as paorc

from ray.data.block import BlockAccessor
from ray.data.datasource import BlockBasedFileDatasink, FileBasedDatasource


class OrcDatasource(FileBasedDatasource):
    """Read ORC files as one Dataset, one stripe at a time."""

    _FILE_EXTENSIONS = ["orc"]

    def _read_stream(self, f: pa.NativeFile, path: str):
        # ORC needs seekable input (footer-first format) but the
        # datasource hands a forward stream — buffer the file (files
        # are one-per-block by the sink, so this is block-sized) and
        # read stripe by stripe from the BufferReader. A deployment
        # with filesystem random access would open natively instead.
        reader = paorc.ORCFile(pa.BufferReader(f.read()))
        for i in range(reader.nstripes):
            yield pa.Table.from_batches([reader.read_stripe(i)])


class OrcDatasink(BlockBasedFileDatasink):
    """Write each block as one ORC file."""

    def __init__(self, path: str, **kwargs):
        super().__init__(path, file_format="orc", **kwargs)

    def write_block_to_file(self, block: BlockAccessor, file: pa.NativeFile):
        paorc.write_table(block.to_arrow(), file)


def write_orc(ds, path: str) -> None:
    """``ds.write_datasink`` over :class:`OrcDatasink` (one file per
    block)."""
    ds.write_datasink(OrcDatasink(path))


def read_orc(paths):
    """``ray.data.read_datasource`` over :class:`OrcDatasource`."""
    import ray.data as rd

    return rd.read_datasource(OrcDatasource(paths))
