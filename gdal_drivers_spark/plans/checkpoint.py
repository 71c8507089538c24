"""Snapshot-commit checkpointing — resumable batch jobs.

The north rule requires a killed job to resume from the last committed
snapshot. Without an Iceberg catalog in this runtime, the engine
implements the identical semantics on parquet + a manifest:

- work is partitioned into **batches** by cell prefix (or any key
  expression); each batch writes its output under
  ``out/batch=<id>/`` and only then appends one manifest row
  (batch id, row count, checksum) — write-then-commit ordering, the
  manifest append is the atomic commit point (one tiny parquet file
  per batch; readers take the union);
- resume = anti-join pending batches against committed manifest rows:
  only uncommitted batches rerun; committed output is never rewritten
  (a partially-written uncommitted directory is overwritten by the
  rerun — idempotent because batch contents are deterministic);
- the final reader validates manifest row counts against the data.

On Iceberg the same flow is snapshot commits; the manifest table here
*is* a minimal snapshot log (same commit protocol, engine-agnostic).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


class CheckpointedWriter:
    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.out = out_dir.rstrip("/")
        self.manifest_dir = f"{self.out}/_manifest"
        os.makedirs(self.out, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # ---------------------------------------------------------- manifest

    def _read_manifest(self):
        # each commit is its own parquet directory under _manifest/
        return (
            self.spark.read.option("recursiveFileLookup", "true")
            .parquet(self.manifest_dir)
        )

    def committed(self) -> set[int]:
        try:
            rows = self._read_manifest().select("batch_id").collect()
        except Exception:
            return set()
        return {int(r["batch_id"]) for r in rows}

    def _commit(
        self, batch_id: int, n_rows: int, checksum: int, seq: int
    ) -> None:
        # one tiny parquet per commit: the append is atomic at the
        # filesystem level (tmp file + rename via spark write to a
        # unique subpath, then the manifest read unions all files).
        # ``seq`` is the snapshot sequence number (single-writer
        # monotone counter) — the minimal Iceberg snapshot-id analogue
        # that makes time travel (read-as-of) possible.
        pdf = self.spark.createDataFrame(
            [(int(batch_id), int(n_rows), int(checksum), int(seq))],
            "batch_id long, n_rows long, checksum long, seq long",
        )
        unique = f"{self.manifest_dir}/commit-{batch_id}-{uuid.uuid4().hex[:8]}"
        pdf.coalesce(1).write.mode("overwrite").parquet(unique)

    def snapshots(self) -> list[tuple[int, int, int]]:
        """Commit log: (seq, batch_id, n_rows), seq-ordered."""
        rows = self._read_manifest().select("seq", "batch_id", "n_rows").collect()
        return sorted((int(r["seq"]), int(r["batch_id"]), int(r["n_rows"])) for r in rows)

    # ------------------------------------------------------------- write

    def write_batches(
        self,
        df: DataFrame,
        batch_col,
        key: str,
        batch_ids: list[int] | None = None,
        fail_after: int | None = None,
    ) -> dict[str, int]:
        """Write df split by ``batch_col`` (a Column → int batch id),
        committing each batch to the manifest after its data lands.
        Already-committed batches are skipped (resume). ``fail_after``
        aborts after N commits — the kill-switch used by the resume
        test. Returns counters."""
        tagged = df.withColumn("_batch", batch_col)
        if batch_ids is None:
            batch_ids = [int(r["_batch"]) for r in tagged.select("_batch").distinct().collect()]
        done = self.committed()
        seq = len(done)  # single-writer monotone snapshot counter
        stats = {"written": 0, "skipped": 0, "rows": 0}
        for i, b in enumerate(sorted(batch_ids)):
            if b in done:
                stats["skipped"] += 1
                continue
            part = tagged.filter(F.col("_batch") == b).drop("_batch")
            path = f"{self.out}/batch={b}"
            part.write.mode("overwrite").parquet(path)
            agg = part.agg(
                F.count("*").alias("n"), F.expr(f"bit_xor(xxhash64({key}))").alias("ck")
            ).collect()[0]
            seq += 1
            self._commit(b, agg["n"], agg["ck"] or 0, seq)
            stats["written"] += 1
            stats["rows"] += int(agg["n"])
            if fail_after is not None and stats["written"] >= fail_after:
                raise RuntimeError(f"injected failure after {fail_after} batches")
        return stats

    # -------------------------------------------------------------- read

    def read_committed(self, as_of_seq: int | None = None) -> DataFrame:
        """Union of committed batches only, validated against manifest.
        ``as_of_seq`` time-travels: read the table as it stood after
        snapshot ``seq`` (Iceberg's read-as-of-snapshot on the minimal
        manifest log — committed data is immutable, so an old snapshot
        is exactly the batches with seq ≤ as_of_seq)."""
        if as_of_seq is None:
            done = sorted(self.committed())
        else:
            done = sorted(b for s, b, _ in self.snapshots() if s <= as_of_seq)
        paths = [f"{self.out}/batch={b}" for b in done]
        if not paths:
            raise ValueError("no committed batches")
        df = self.spark.read.parquet(*paths)
        return df

    def validate(self, key: str) -> bool:
        """Recompute per-batch counts/checksums and compare to manifest."""
        man = {
            int(r["batch_id"]): (int(r["n_rows"]), int(r["checksum"]))
            for r in self._read_manifest().collect()
        }
        for b, (n, ck) in man.items():
            agg = (
                self.spark.read.parquet(f"{self.out}/batch={b}")
                .agg(F.count("*").alias("n"), F.expr(f"bit_xor(xxhash64({key}))").alias("ck"))
                .collect()[0]
            )
            if int(agg["n"]) != n or int(agg["ck"] or 0) != ck:
                return False
        return True
