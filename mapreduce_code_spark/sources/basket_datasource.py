"""Spark 4 Python Data Source for the reference's native basket text
format (one whitespace-separated basket per line —
``apriori_final.java:6,51-53``), so the format plugs into the regular
reader/writer surface::

    spark.dataSource.register(BasketTextDataSource)
    df = spark.read.format("basket_text").load(path)   # or .option(...)
    df.write.format("basket_text").mode("overwrite").save(path)

Versus :func:`mapreduce_code_spark.sources.io.read_transactions_text`
(spark.read.text + column ops), this is the CONNECTOR formulation: the
format owns its schema, splits itself into input partitions (one per
file, the same granularity as the reference's FileInputFormat), and
assigns basket ids deterministically as ``(file_index << 32) | line_no``
— a pure function of the data layout, unlike
``monotonically_increasing_id`` which depends on the runtime partition
layout. Executors each read only their own partition's file — the
driver never touches row data.

Scale notes: the file listing is one driver-side metadata pass (same as
any file index); a 100 TB corpus of many files fans out one partition
per file. Per-file byte-range splitting is deliberately NOT done — the
format is line-oriented with no sync markers, so ranges would need
newline resync; many-files is the layout the reference's own
TextInputFormat-era tooling produces. Python-side reading costs one
interpreter pass per row — the right trade for a legacy ingest format
whose alternative is not reading it at all; bulk columnar stays on
parquet.

Format limitation (inherent to the reference's line format): an EMPTY
basket has no representation — a blank line reads back as "no basket" —
so the writer skips rows whose ``items`` array is empty instead of
emitting a blank line that would silently vanish on read.

This module is pure-Python and must stay import-light: Spark pickles
the DataSource/Reader/Writer objects to executors.
"""

from __future__ import annotations

import glob
import os
import re
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("basket_id", LongType(), False),
        StructField("items", ArrayType(StringType()), False),
    ]
)


@dataclass
class _FilePartition(InputPartition):
    index: int
    path: str


@dataclass
class _Committed(WriterCommitMessage):
    path: str


def _list_input(path: str) -> list[str]:
    """Files under ``path`` (a file, a directory, or a glob), sorted for
    deterministic partition indices. Hidden/marker files are skipped,
    like Spark's own file index."""
    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, "*"))
    else:
        cands = glob.glob(path) or [path]
    return sorted(
        p
        for p in cands
        if os.path.isfile(p)
        and not os.path.basename(p).startswith(("_", "."))
    )


class _BasketReader(DataSourceReader):
    def __init__(self, path: str, ordered: bool):
        self._files = _list_input(path)  # driver-side: metadata only
        self._ordered = ordered

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(i, p) for i, p in enumerate(self._files)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        base = partition.index << 32
        with open(partition.path, encoding="utf-8") as fh:
            for line_no, line in enumerate(fh):
                if line_no >= 1 << 32:
                    # ids pack (file_index << 32 | line_no); letting
                    # line_no bleed into the file bits would silently
                    # collide with the next file's ids
                    raise ValueError(
                        f"{partition.path}: >= 2^32 lines — split the file"
                    )
                line = line.strip()
                if not line:  # blank lines carry no basket (io.py parity)
                    continue
                toks = re.split(r"\s+", line)
                if self._ordered:  # first occurrence wins, order kept
                    items = list(dict.fromkeys(toks))
                else:  # canonical set identity: sorted + distinct
                    items = sorted(set(toks))
                yield (base | line_no, items)


class _BasketWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool):
        self._path = path
        self._overwrite = overwrite

    def write(self, iterator) -> _Committed:  # executor-side
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self._path, exist_ok=True)
        # unique temp name per attempt; commit() promotes — a failed/
        # speculative attempt leaves only an uncommitted temp file
        tmp = os.path.join(
            self._path, f".part-{pid:05d}-{uuid.uuid4().hex}.tmp"
        )
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                # the line format cannot represent an empty basket (a
                # blank line reads back as "no basket"), so empty item
                # arrays are SKIPPED rather than silently becoming a
                # dropped blank line — same information loss, stated
                if row.items:
                    fh.write(" ".join(row.items) + "\n")
        return _Committed(tmp)

    def commit(self, messages) -> None:  # driver-side
        if self._overwrite:
            for old in _list_input(self._path):
                os.remove(old)
        # commit-scoped token keeps append-mode writes from clobbering an
        # earlier commit's part files of the same index
        token = uuid.uuid4().hex[:8]
        for i, m in enumerate(messages):
            os.replace(
                m.path,
                os.path.join(self._path, f"part-{i:05d}-{token}.txt"),
            )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class BasketTextDataSource(DataSource):
    """``format("basket_text")``: options ``path`` (or the ``load``/
    ``save`` argument) and ``ordered`` (default false — canonical
    sorted-distinct item identity; true keeps line token order for
    faithful reference replay)."""

    @classmethod
    def name(cls) -> str:
        return "basket_text"

    def schema(self) -> StructType:
        return SCHEMA

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "basket_text requires a path: .load(path)/.save(path)"
            )
        return path

    def reader(self, schema: StructType) -> DataSourceReader:
        ordered = str(self.options.get("ordered", "false")).lower() == "true"
        return _BasketReader(self._path(), ordered)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        names = [f.name for f in schema.fields]
        if "items" not in names:
            raise ValueError(
                f"basket_text writes an 'items' array column, got {names}"
            )
        return _BasketWriter(self._path(), overwrite)
