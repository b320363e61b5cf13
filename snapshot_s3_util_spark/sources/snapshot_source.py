"""Custom DataSource V2: read an exported snapshot AS a snapshot.

The reference reads HBase snapshots (manifest + immutable HFile refs)
via `TableSnapshotInputFormat`; the engine's columnar equivalent is a
snapshot directory written by `sources/sinks.py`:

    <root>/<bucket>/<prefix>/<snapshot_name>/
        event_type=<v>/part-*.parquet     (immutable "HFiles")

This module implements that reader as a real Spark 4 Python DataSource
(`pyspark.sql.datasource.DataSource`): one input partition per
partition directory (the region analog), Arrow-batch reads via pyarrow,
and partition pruning through the `partitions` option — the same design
a production `TableSnapshotInputFormat` DSv2 wrapper would use for
rowkey-range pruning + CF projection (SURVEY §4, design row "HBase
snapshot direct source").

For plain directories `spark.read.parquet` is strictly better (it gets
the vectorized reader + catalyst pushdown); this source exists to show
the snapshot-native path: reading the manifest, mapping one split per
immutable file group, pruning splits before any data I/O.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class SnapshotPartition(InputPartition):
    def __init__(self, part_value: str, files: list[str]):
        self.part_value = part_value
        self.files = files


class HBaseSnapshotDataSource(DataSource):
    """`spark.read.format("hbase_snapshot")` after registration.

    Options:
      path        snapshot root (the `<snapshot_name>` directory)
      partitions  optional comma-separated partition values to keep
                  (pruning happens at planning time — unselected
                  "regions" are never opened)
    """

    @classmethod
    def name(cls) -> str:
        return "hbase_snapshot"

    def schema(self) -> str:
        # events schema after canonical load, partition column last
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "value double, props string, event_type string"
        )

    def reader(self, schema: StructType) -> "SnapshotReader":
        return SnapshotReader(schema, self.options)


class SnapshotReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options.get("path")
        if not self.root:
            raise ValueError("hbase_snapshot source requires a 'path' option")
        wanted = options.get("partitions")
        self.wanted = set(wanted.split(",")) if wanted else None

    def partitions(self) -> list[SnapshotPartition]:
        """One split per partition dir — the region/HFile-group analog.

        Pruning: requested partition values never reach the I/O layer,
        mirroring TableSnapshotInputFormat skipping regions outside the
        scan's rowkey range.
        """
        parts = []
        for d in sorted(glob.glob(os.path.join(self.root, "event_type=*"))):
            value = os.path.basename(d).split("=", 1)[1]
            if self.wanted is not None and value not in self.wanted:
                continue
            files = sorted(glob.glob(os.path.join(d, "*.parquet")))
            if files:
                parts.append(SnapshotPartition(value, files))
        if not parts:
            raise FileNotFoundError(f"no snapshot partitions under {self.root}")
        return parts

    def read(self, partition: SnapshotPartition) -> Iterator:
        """Yield Arrow batches (not rows) — the fast path of the Python
        DataSource API; pyarrow does the columnar decode."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = [f.name for f in self.schema.fields if f.name != "event_type"]
        for path in partition.files:
            table = pq.read_table(path, columns=cols)
            # Spark writes INT96 timestamps which pyarrow surfaces as
            # ns; Spark's Arrow bridge only accepts us — truncate.
            for i, field in enumerate(table.schema):
                if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
                    table = table.set_column(
                        i, field.name, table.column(i).cast(pa.timestamp("us"))
                    )
            # re-attach the partition value as a column (hive layout
            # stores it only in the directory name)
            n = table.num_rows
            table = table.append_column(
                "event_type", pa.array([partition.part_value] * n, pa.string())
            )
            yield from table.to_batches(max_chunksize=8192)


def register_snapshot_source(spark) -> None:
    spark.dataSource.register(HBaseSnapshotDataSource)
