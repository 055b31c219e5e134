"""ORC source + sink as custom Ray Data connectors.

Ray Data 2.49 ships no ORC reader/writer; ORC is a standard columnar
warehouse interchange format, so the engine provides both directions as
thin subclasses of the PUBLIC connector base classes
(``ray.data.datasource.FileBasedDatasource`` / ``BlockBasedFileDatasink``)
over ``pyarrow.orc``:

- **read**: one read task per file (the base class's distributed file
  planning — size-based parallelism, path expansion, extension filter),
  each task streaming the file stripe-by-stripe so a huge ORC file never
  materializes whole in a worker's heap; column pruning pushes into
  ``ORCFile.read_stripe(columns=...)`` exactly like the parquet reader's
  ``columns=``.
- **write**: one ORC file per block via the distributed-datasink protocol
  (same layout contract as ``write_parquet`` — a directory of per-task
  files, resumable/partitioned output).

The reference engine reads edge lists from text only (SURVEY §2.1); this
rounds out the engine's source conformance family (parquet/CSV/JSONL/ORC).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Union

import pyarrow as pa
import ray.data as rd
from ray.data.datasource import BlockBasedFileDatasink, FileBasedDatasource


class ORCDatasource(FileBasedDatasource):
    """Stripe-streaming ORC reader with column pruning."""

    _FILE_EXTENSIONS = ["orc"]

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
        # ORC footers/stripe indexes need random access; the base class's
        # sequential input stream raises "only valid on seekable files"
        return filesystem.open_input_file(path)

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[pa.Table]:
        import pyarrow.orc as po

        o = po.ORCFile(f)
        for i in range(o.nstripes):
            batch = o.read_stripe(i, columns=self._columns)
            yield pa.Table.from_batches([batch])


class ORCDatasink(BlockBasedFileDatasink):
    """One ORC file per block (the write_parquet directory contract)."""

    def __init__(self, path: str, **file_datasink_kwargs):
        super().__init__(path, file_format="orc", **file_datasink_kwargs)

    def write_block_to_file(self, block, file: "pa.NativeFile") -> None:
        import pyarrow.orc as po

        po.write_table(block.to_arrow(), file)


def read_orc(
    paths: Union[str, List[str]],
    *,
    columns: Optional[List[str]] = None,
    **read_kwargs,
) -> rd.Dataset:
    """``ray.data.read_parquet``-shaped entry point for ORC files."""
    return rd.read_datasource(
        ORCDatasource(paths, columns=columns, file_extensions=["orc"]),
        **read_kwargs,
    )


def write_orc(ds: rd.Dataset, path: str, **sink_kwargs) -> None:
    ds.write_datasink(ORCDatasink(path, **sink_kwargs))
