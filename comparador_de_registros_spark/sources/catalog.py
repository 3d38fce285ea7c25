"""Thin table catalog: parquet directories locally, Iceberg in prod.

The north_rule mandates Iceberg tables with per-stage checkpoints and
resumability. This sandbox's Spark 4.1.2 has no Iceberg jars
(SURVEY.md §7 hard parts), so the engine codes against this interface:

* :class:`ParquetCatalog` — parquet directory per table with Spark's
  ``_SUCCESS`` marker as the commit point (atomic enough for
  restart-from-stage semantics: a stage output either has its marker or
  is rewritten wholesale).
* :class:`IcebergCatalog` — same interface over a real catalog with
  ``df.writeTo(ident).createOrReplace()``; requires the Iceberg runtime
  jars + catalog conf on the cluster. Untested here by necessity; the
  pipeline takes any ``Catalog``.

Every write may be explicitly partitioned/bucketed — the pipeline
passes partition columns so big tables land salted/partitioned rather
than however the last shuffle left them.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def exists(self, name: str) -> bool:
        raise NotImplementedError

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        raise NotImplementedError

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        num_files: int | None = None,
    ) -> None:
        raise NotImplementedError

    def drop(self, name: str) -> None:
        raise NotImplementedError

    def partition_lineage(self, name: str) -> list[tuple[str, int, int]]:
        """Per-output-partition (file) row/byte counts for ``name`` —
        the north_rule's per-partition lineage record. Implementations
        must answer from table metadata, never a data scan."""
        raise NotImplementedError


@dataclass
class ParquetCatalog(Catalog):
    base_dir: str

    def path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.path(name), "_SUCCESS"))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        num_files: int | None = None,
    ) -> None:
        if num_files is not None:
            df = df.repartition(num_files)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(name))

    def drop(self, name: str) -> None:
        shutil.rmtree(self.path(name), ignore_errors=True)

    def partition_lineage(self, name: str) -> list[tuple[str, int, int]]:
        """-> [(relative file path, n_rows, n_bytes)] from parquet
        FOOTERS only (metadata reads, ~ms for a 64-file table)."""
        import pyarrow.parquet as pq

        root = self.path(name)
        out = []
        for dirpath, _dirs, files in sorted(os.walk(root)):
            for fn in sorted(files):
                if not fn.endswith(".parquet"):
                    continue
                fp = os.path.join(dirpath, fn)
                out.append(
                    (
                        os.path.relpath(fp, root),
                        pq.ParquetFile(fp).metadata.num_rows,
                        os.path.getsize(fp),
                    )
                )
        return out


@dataclass
class IcebergCatalog(Catalog):
    """Iceberg-backed variant (production path).

    ``namespace`` like ``lake.dedup``; requires
    ``spark.sql.catalog.<cat>`` configured with the Iceberg runtime.
    """

    namespace: str

    def _ident(self, name: str) -> str:
        return f"{self.namespace}.{name}"

    def exists(self, name: str) -> bool:  # pragma: no cover - needs Iceberg
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        return spark.catalog.tableExists(self._ident(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:  # pragma: no cover
        return spark.read.table(self._ident(name))

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        num_files: int | None = None,
    ) -> None:  # pragma: no cover - needs Iceberg
        writer = df.writeTo(self._ident(name)).using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()

    def drop(self, name: str) -> None:  # pragma: no cover - needs Iceberg
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        spark.sql(f"DROP TABLE IF EXISTS {self._ident(name)}")

    def partition_lineage(
        self, name: str
    ) -> list[tuple[str, int, int]]:  # pragma: no cover - needs Iceberg
        """Iceberg keeps this in its own metadata: the ``.files``
        table carries (file_path, record_count, file_size_in_bytes)
        per data file — a metadata-only scan, same contract as the
        parquet-footer path."""
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        rows = spark.read.table(f"{self._ident(name)}.files").select(
            "file_path", "record_count", "file_size_in_bytes"
        ).collect()
        return [
            (r["file_path"], int(r["record_count"]), int(r["file_size_in_bytes"]))
            for r in rows
        ]
