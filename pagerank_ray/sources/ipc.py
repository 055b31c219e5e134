"""Arrow IPC (Feather v2) source + sink as custom Ray Data connectors.

Ray Data 2.49 ships no IPC/Feather reader/writer; the IPC file format is
Arrow's own zero-copy interchange container (the same bytes Flight and
shared-memory pipelines exchange), so the engine provides both directions
as thin subclasses of the PUBLIC connector base classes — the exact shape
of the ORC connector (sources/orc.py):

- **read**: one read task per file, streaming RECORD BATCH by record
  batch via ``pa.ipc.open_file`` (random-access footer; a huge file never
  materializes whole in a worker), with column pruning applied per batch.
- **write**: one IPC file per block via the distributed-datasink protocol
  (the ``write_parquet`` directory contract — resumable, partitioned).

The reference engine reads edge lists from text only (SURVEY §2.1); this
extends the source conformance family (parquet/CSV/JSONL/ORC/IPC).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Union

import pyarrow as pa
import ray.data as rd
from ray.data.datasource import BlockBasedFileDatasink, FileBasedDatasource


class IPCDatasource(FileBasedDatasource):
    """Record-batch-streaming Arrow IPC (Feather v2) reader."""

    _FILE_EXTENSIONS = ["arrow", "feather", "ipc"]

    def __init__(
        self,
        paths: Union[str, List[str]],
        *,
        columns: Optional[List[str]] = None,
        **file_based_datasource_kwargs,
    ):
        super().__init__(paths, **file_based_datasource_kwargs)
        self._columns = columns

    def _open_input_source(self, filesystem, path: str, **open_args):
        # the IPC file footer needs random access (same contract as ORC)
        return filesystem.open_input_file(path)

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[pa.Table]:
        reader = pa.ipc.open_file(f)
        for i in range(reader.num_record_batches):
            batch = reader.get_batch(i)
            t = pa.Table.from_batches([batch])
            if self._columns is not None:
                t = t.select(self._columns)
            yield t


class IPCDatasink(BlockBasedFileDatasink):
    """One IPC file per block (the write_parquet directory contract)."""

    def __init__(self, path: str, **file_datasink_kwargs):
        super().__init__(path, file_format="arrow", **file_datasink_kwargs)

    def write_block_to_file(self, block, file: "pa.NativeFile") -> None:
        table = block.to_arrow()
        with pa.ipc.new_file(file, table.schema) as writer:
            writer.write_table(table)


def read_ipc(
    paths: Union[str, List[str]],
    *,
    columns: Optional[List[str]] = None,
    **read_kwargs,
) -> rd.Dataset:
    """``ray.data.read_parquet``-shaped entry point for Arrow IPC files."""
    return rd.read_datasource(
        IPCDatasource(
            paths, columns=columns,
            file_extensions=["arrow", "feather", "ipc"],
        ),
        **read_kwargs,
    )


def write_ipc(ds: rd.Dataset, path: str, **write_kwargs) -> None:
    """``ds.write_parquet``-shaped distributed IPC write (one file/block)."""
    ds.write_datasink(IPCDatasink(path), **write_kwargs)
