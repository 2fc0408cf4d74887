"""Real-Iceberg twin of :class:`~easyner_spark.sinks.checkpoint.SnapshotTable`
(VERDICT r3 next-step #6).

`SnapshotTable` is a faithful mini-Iceberg on plain parquet (atomic
pointer commits, keyed MERGE, rollback, time travel, epoch-guarded
additive folds) so the engine runs anywhere. Production deployments
should run the genuine catalog: `IcebergSnapshotTable` exposes the
SAME method surface over a real Iceberg table, so the operator code
above it (resumable_run, the streaming incremental-KG sink, the
crawl-funnel stage checkpoints) swaps writers with one constructor
change.

Semantics mapping (all public Iceberg Spark SQL / DataFrameWriterV2
API — no private interfaces):

  parquet twin                      Iceberg
  --------------------------------  -------------------------------------
  snapshot dir + _CURRENT pointer   catalog commit (serializable)
  history()                         <table>.snapshots metadata table
  read_snapshot(id)                 read option("snapshot-id", id)
  rollback(id)                      CALL <cat>.system.rollback_to_snapshot
  merge (last-wins upsert)          MERGE INTO ... WHEN MATCHED UPDATE *
                                    WHEN NOT MATCHED INSERT *
  merge_additive + epoch guard      full-table overwrite via writeTo()
                                    .option('snapshot-property.easyner.epoch')
                                    — the property commits ATOMICALLY with
                                    the data snapshot, same crash-window
                                    guarantee as the pointer-file encoding
  current_epoch()                   max easyner.epoch along the CURRENT
                                    snapshot's ancestry (walking parents —
                                    rollback therefore restores the epoch
                                    committed with that lineage, exactly
                                    like the parquet twin's _EPOCH files)

Gating: `iceberg_available(spark)` checks that the Iceberg Spark
runtime class is on the JVM classpath AND the named catalog is
configured; the constructor raises a clear error otherwise. The
parity suite (tests/test_iceberg_checkpoint.py) runs the SAME
scenarios against both writers and skips the Iceberg half where the
runtime jar is absent (this sandbox) — configure e.g.

    spark.sql.catalog.local               org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.local.type          hadoop
    spark.sql.catalog.local.warehouse     /tmp/iceberg-warehouse

and the suite exercises the real catalog.

Epoch note: merge() intentionally does NOT stamp an epoch property —
like the parquet twin it carries the previously committed epoch
forward, which here falls out of the ancestry walk for free (the new
snapshot's parent chain still contains the epoch-stamped commit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_PROP = "easyner.epoch"


def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    """True iff the Iceberg Spark runtime is on the classpath and
    `catalog` is configured as an Iceberg catalog in this session."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    return bool(impl)


class IcebergSnapshotTable:
    """Iceberg-backed SnapshotTable: same method surface, catalog
    commits instead of pointer files. `ident` is the catalog-qualified
    table name, e.g. ``local.db.edges``."""

    def __init__(self, spark: SparkSession, ident: str, key_cols: list[str]):
        self.spark = spark
        self.ident = ident
        self.key_cols = list(key_cols)
        self.catalog = ident.split(".", 1)[0]
        if not iceberg_available(spark, self.catalog):
            raise RuntimeError(
                "Iceberg runtime/catalog not available: add the "
                "iceberg-spark-runtime jar and configure "
                f"spark.sql.catalog.{self.catalog} (see module docstring)"
            )

    # -- metadata ---------------------------------------------------------
    def _exists(self) -> bool:
        return self.spark.catalog.tableExists(self.ident)

    def history(self) -> list[int]:
        if not self._exists():
            return []
        return [
            int(r["snapshot_id"])
            for r in self.spark.sql(
                f"SELECT snapshot_id FROM {self.ident}.snapshots "
                "ORDER BY committed_at, snapshot_id"
            ).collect()
        ]

    def current_snapshot(self) -> int | None:
        if not self._exists():
            return None
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.ident}.history "
            "WHERE is_current_ancestor ORDER BY made_current_at DESC, "
            "snapshot_id DESC LIMIT 1"
        ).collect()
        return int(rows[0][0]) if rows else None

    def _ancestry(self) -> list[dict]:
        """summary maps from the current snapshot up its parent chain."""
        if not self._exists():
            return []
        snaps = {
            int(r["snapshot_id"]): (
                None if r["parent_id"] is None else int(r["parent_id"]),
                dict(r["summary"] or {}),
            )
            for r in self.spark.sql(
                f"SELECT snapshot_id, parent_id, summary FROM {self.ident}.snapshots"
            ).collect()
        }
        chain, cur = [], self.current_snapshot()
        while cur is not None and cur in snaps:
            parent, summary = snaps[cur]
            chain.append(summary)
            cur = parent
        return chain

    def current_epoch(self) -> int | None:
        """First easyner.epoch found walking UP from the current
        snapshot — rollback restores the epoch committed with that
        lineage (the parquet twin's _EPOCH semantics)."""
        for summary in self._ancestry():
            if EPOCH_PROP in summary:
                return int(summary[EPOCH_PROP])
        return None

    # -- data ---------------------------------------------------------------
    def read(self, spark: SparkSession | None = None) -> DataFrame | None:
        s = spark or self.spark
        return s.table(self.ident) if self._exists() else None

    def read_snapshot(
        self, spark: SparkSession | None = None, snap: int | None = None
    ) -> DataFrame:
        s = spark or self.spark
        if snap not in self.history():
            raise ValueError(f"unknown snapshot {snap}; have {self.history()}")
        return s.read.option("snapshot-id", str(snap)).table(self.ident)

    def rollback(self, snap: int) -> None:
        if snap not in self.history():
            raise ValueError(f"unknown snapshot {snap}; have {self.history()}")
        tbl = self.ident.split(".", 1)[1]
        self.spark.sql(
            f"CALL {self.catalog}.system.rollback_to_snapshot"
            f"('{tbl}', {int(snap)})"
        )

    def merge(self, df: DataFrame) -> int:
        """Keyed last-wins upsert via real MERGE INTO. `df` must be
        key-unique (MERGE requires it; the parquet twin's window picks
        an arbitrary-but-deterministic winner instead — callers that
        may carry intra-batch duplicates should pre-dedup)."""
        if not self._exists():
            df.writeTo(self.ident).create()
        else:
            view = f"_easyner_merge_{abs(hash(self.ident)) % 10**8}"
            df.createOrReplaceTempView(view)
            on = " AND ".join(f"t.{k} <=> s.{k}" for k in self.key_cols)
            self.spark.sql(
                f"MERGE INTO {self.ident} t USING {view} s ON {on} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            self.spark.catalog.dropTempView(view)
        return self.current_snapshot()

    def merge_additive(
        self, df: DataFrame, sum_cols: list[str], epoch: int | None = None
    ) -> int:
        """Additive fold with the exactly-once epoch guard: the epoch
        id commits ATOMICALLY with the data as an Iceberg snapshot
        property (writeTo option 'snapshot-property.easyner.epoch') —
        a replayed epoch is a no-op, same contract as the parquet twin."""
        if epoch is not None:
            done = self.current_epoch()
            if done is not None and done >= epoch:
                return self.current_snapshot()
        cur = self.read()
        merged = df if cur is None else cur.unionByName(df)
        merged = merged.groupBy(*self.key_cols).agg(
            *[F.sum(c).alias(c) for c in sum_cols]
        )
        writer = merged.writeTo(self.ident)
        if epoch is not None:
            writer = writer.option(f"snapshot-property.{EPOCH_PROP}", str(epoch))
        if self._exists():
            # full-snapshot replace, one serializable commit (the
            # aggregate table is small by construction — keys, not rows)
            writer.overwrite(F.lit(True))
        else:
            writer.create()
        return self.current_snapshot()

    def overwrite(self, df: DataFrame) -> int:
        writer = df.writeTo(self.ident)
        if self._exists():
            writer.overwrite(F.lit(True))
        else:
            writer.create()
        return self.current_snapshot()

    # -- table maintenance -------------------------------------------
    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        """CALL <catalog>.system.expire_snapshots(retain_last =>
        keep_last) — the genuine retention procedure behind the
        parquet twin's method of the same name. Iceberg itself never
        expires the current snapshot; `older_than => now` makes
        retain_last the only binding constraint (the procedure's
        default is a 5-day age floor, useless in tests). Returns the
        ids that disappeared from the snapshots metadata table."""
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1: {keep_last}")
        before = set(self.history())
        tbl = self.ident.split(".", 1)[1]
        now = self.spark.sql("SELECT CAST(current_timestamp() AS STRING)").first()[0]
        self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots("
            f"table => '{tbl}', older_than => TIMESTAMP '{now}', "
            f"retain_last => {int(keep_last)})"
        )
        return sorted(before - set(self.history()))

    def remove_orphans(self) -> list[str]:
        """CALL <catalog>.system.remove_orphan_files — the genuine
        unreferenced-file GC behind the parquet twin's method. Returns
        the orphan file locations the procedure deleted. NOTE: Iceberg
        refuses to consider files younger than a safety interval
        (default 3 days) so a just-crashed writer's in-flight files
        survive — production calls need no override; tests assert the
        call shape, not young-file deletion."""
        tbl = self.ident.split(".", 1)[1]
        rows = self.spark.sql(
            f"CALL {self.catalog}.system.remove_orphan_files(table => '{tbl}')"
        ).collect()
        return sorted(r[0] for r in rows)
