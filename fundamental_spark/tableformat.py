"""Parquet-backed table shim with Iceberg-like semantics.

The design targets Iceberg tables (MERGE INTO, snapshots, partition
pruning). This sandbox has no Iceberg runtime jar, so `Warehouse`
emulates the API over versioned parquet snapshot directories:

- every write is a new immutable snapshot dir (``v000001/``...), with a
  ``_current`` pointer file updated atomically last — that gives us the
  snapshot pinning the crawl resume path needs (SURVEY.md §2.8 T5);
- ``merge_upsert`` emulates ``MERGE INTO target USING batch ON key`` by
  key-wise combine + full snapshot rewrite (correct, slower; on a real
  cluster the same call sites would issue Iceberg MERGE and rewrite
  only matching data files);
- ``append`` writes the union as a new snapshot (append-only logs).

At 100 TB an Iceberg catalog replaces this class wholesale — all call
sites go through this narrow API so the swap is one module.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---- snapshot plumbing -------------------------------------------------
    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _current_path(self, name: str) -> str:
        return os.path.join(self._tdir(name), "_current")

    def current_version(self, name: str) -> int:
        p = self._current_path(name)
        if not os.path.exists(p):
            return 0
        with open(p) as f:
            return int(f.read().strip())

    def _snapshot_dir(self, name: str, version: int) -> str:
        return os.path.join(self._tdir(name), f"v{version:06d}")

    def exists(self, name: str) -> bool:
        return self.current_version(name) > 0

    def _commit(self, name: str, df: DataFrame) -> int:
        new_v = self.current_version(name) + 1
        out = self._snapshot_dir(name, new_v)
        df.write.mode("overwrite").parquet(out)
        tmp = self._current_path(name) + ".tmp"
        os.makedirs(self._tdir(name), exist_ok=True)
        with open(tmp, "w") as f:
            f.write(str(new_v))
        os.replace(tmp, self._current_path(name))  # atomic pointer swap = commit
        return new_v

    # ---- public API (Iceberg-shaped) ---------------------------------------
    def read(self, name: str, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version(name)
        if v <= 0:
            raise FileNotFoundError(f"table {name} has no snapshot")
        return self.spark.read.parquet(self._snapshot_dir(name, v))

    def read_or_empty(self, name: str, schema: StructType) -> DataFrame:
        if self.exists(name):
            return self.read(name)
        return self.spark.createDataFrame([], schema)

    def overwrite(self, name: str, df: DataFrame) -> int:
        return self._commit(name, df)

    def append_delta(self, name: str, df: DataFrame) -> int:
        """Append-only commit: the new snapshot dir holds ONLY the delta;
        ``read_deltas`` unions all snapshot dirs up to a pinned version —
        the parquet emulation of Iceberg appends (no rewrite of history)."""
        return self._commit(name, df)

    def read_deltas(self, name: str, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version(name)
        if v <= 0:
            raise FileNotFoundError(f"table {name} has no snapshot")
        paths = [self._snapshot_dir(name, i) for i in range(1, v + 1)]
        return self.spark.read.parquet(*paths)

    def append(self, name: str, df: DataFrame, schema: StructType) -> int:
        base = self.read_or_empty(name, schema)
        return self._commit(name, base.unionByName(df))

    def merge_upsert(
        self,
        name: str,
        batch: DataFrame,
        key: str,
        schema: StructType,
        when_matched_update: dict[str, F.Column] | None = None,
    ) -> int:
        """MERGE INTO name USING batch ON key.

        Default: matched rows are replaced by the batch row, unmatched
        target rows kept, unmatched batch rows inserted (the reference's
        insert-or-update upsert, database.go:766-915). If
        ``when_matched_update`` is given, it maps column -> expression
        evaluated on the joined (target t.*, batch b.*) row for matched
        rows instead of plain replacement.
        """
        target = self.read_or_empty(name, schema)
        cols = [f.name for f in schema.fields]
        if when_matched_update is None:
            merged = target.join(batch.select(key), on=key, how="left_anti").unionByName(
                batch.select(*cols)
            )
        else:
            t = target.alias("t")
            b = batch.alias("b")
            joined = t.join(b, on=F.col(f"t.{key}") == F.col(f"b.{key}"), how="full_outer")
            matched = F.col(f"b.{key}").isNotNull() & F.col(f"t.{key}").isNotNull()
            only_batch = F.col(f"t.{key}").isNull()
            out_cols = []
            for c in cols:
                upd = when_matched_update.get(c, F.col(f"b.{c}"))
                expr = (
                    F.when(matched, upd)
                    .when(only_batch, F.col(f"b.{c}"))
                    .otherwise(F.col(f"t.{c}"))
                )
                out_cols.append(expr.alias(c))
            merged = joined.select(*out_cols)
        return self._commit(name, merged)

    def rollback(self, name: str, version: int) -> None:
        """Discard snapshots newer than `version` (orphans from a crash
        after data write but before checkpoint commit). Iceberg's
        metadata pointer does this implicitly; the parquet emulation
        prunes physically so append version ranges stay contiguous."""
        cur = self.current_version(name)
        for v in range(version + 1, cur + 1):
            shutil.rmtree(self._snapshot_dir(name, v), ignore_errors=True)
        if cur != version:
            tmp = self._current_path(name) + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(version))
            os.replace(tmp, self._current_path(name))

    def drop(self, name: str) -> None:
        shutil.rmtree(self._tdir(name), ignore_errors=True)
