"""Streaming ingest → snapshot-committed sink (r04, VERDICT #7).

The batch side already has exactly-once semantics through
``plans.checkpoint.CheckpointedWriter`` (write-then-commit manifest,
anti-join resume). This module closes the loop for the STREAMING
decode→assign chain (``streaming/ingest.py``): each micro-batch lands
through ``foreachBatch`` as one checkpoint batch keyed by the epoch id,
so the same manifest — and the same resume/validate/lineage machinery —
covers streaming output too.

Crash semantics (the composition the test kills and restarts):

- Structured Streaming's OWN checkpoint (``checkpointLocation``)
  pins source offsets per epoch, so a replayed epoch re-presents the
  identical rows under the identical epoch id;
- the manifest commit is the engine's atomic point: an epoch that
  crashed AFTER its manifest commit is skipped on replay (anti-join
  resume — no duplicates), one that crashed BEFORE it is rewritten
  idempotently (dynamic partition overwrite over deterministic
  content);
- therefore committed bytes after any kill+restart equal the bytes of
  an uninterrupted run — asserted in tests/test_stream_checkpoint.py.

On Iceberg this is exactly "streaming write with snapshot commits";
here it is the same protocol over the minimal manifest log.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from ..plans.checkpoint import CheckpointedWriter


def _stream_query_id(checkpoint_dir: str) -> str | None:
    """The Structured Streaming query ``id`` from the checkpoint's
    ``metadata`` file — STABLE across restarts of the same
    checkpointLocation (unlike ``runId``), regenerated only when the
    checkpoint dir is deleted or changed. Exactly the identity under
    which epoch ids are comparable."""
    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as fh:
            return json.loads(fh.read()).get("id")
    except (OSError, ValueError):
        return None


def _check_stream_identity(writer: CheckpointedWriter, checkpoint_dir: str) -> None:
    """Guard the exactly-once contract's hidden assumption (ADVICE
    r04, medium): epoch ids are only meaningful within ONE stream
    checkpoint lineage. If the checkpointLocation is deleted/changed
    while the same writer output dir is reused, epoch ids restart at 0
    and the manifest anti-join would silently drop genuinely-new
    micro-batches as "already committed" — data loss, not a replay
    skip. The stream's stable query id is pinned in a sidecar next to
    the manifest; a DIFFERENT id arriving at a manifest that already
    holds committed batches fails fast instead. A manifest that holds
    commits but has NO sidecar (written by a pre-guard engine, or the
    sidecar was deleted) is treated the same way: the guard cannot
    prove the lineage is the original one, and silently adopting the
    current id would re-open the exact data-loss mode it closes — the
    error says how to adopt explicitly when the operator KNOWS the
    lineage is unchanged."""
    qid = _stream_query_id(checkpoint_dir)
    if qid is None:
        return
    marker = os.path.join(writer.manifest_dir, "_stream_id")
    if os.path.exists(marker):
        with open(marker) as fh:
            prev = fh.read().strip()
        if prev == qid:
            return
        if writer.committed():
            raise RuntimeError(
                f"output dir {writer.out} holds batches committed by stream "
                f"query {prev}, but this run is query {qid} (new/changed "
                "checkpointLocation): its epoch ids restart at 0 and are NOT "
                "comparable to the manifest's — resuming would silently skip "
                "new data. Use a fresh output dir, or restore the original "
                "checkpointLocation."
            )
    elif writer.committed():
        raise RuntimeError(
            f"output dir {writer.out} holds committed batches but no "
            "_stream_id sidecar, so the stream lineage that wrote them "
            "cannot be verified against this run — if the checkpoint "
            "lineage changed, resuming would silently skip new data. If "
            f"this IS the original lineage, adopt it explicitly:\n"
            f"  echo '{qid}' > {marker}"
        )
    with open(marker, "w") as fh:
        fh.write(qid)


def checkpointed_sink(
    writer: CheckpointedWriter,
    key: str = "image_id",
    fail_after_commit_of: int | None = None,
    checkpoint_dir: str | None = None,
):
    """``foreachBatch`` callable committing each epoch as one
    checkpoint batch. ``fail_after_commit_of`` is the test kill-switch:
    raise right AFTER that epoch's manifest commit — the state a real
    crash leaves when it dies between the engine commit and Spark's own
    offset commit, which forces an epoch REPLAY on restart (the
    replayed epoch must be skipped by the manifest, not re-applied).

    ``checkpoint_dir`` (when known — ``start_checkpointed_ingest``
    always passes it) arms the stream-identity guard: the first epoch
    of each run verifies the manifest was written under the SAME
    stream query id before any anti-join skip can fire."""
    checked: list[bool] = []

    def _sink(df: DataFrame, epoch_id: int) -> None:
        if checkpoint_dir is not None and not checked:
            _check_stream_identity(writer, checkpoint_dir)
            checked.append(True)
        b = int(epoch_id)
        kill = fail_after_commit_of is not None and b == fail_after_commit_of
        writer.write_batches(
            df,
            F.lit(b).cast("long"),
            key=key,
            batch_ids=[b],
            # fail_after=1 commits this (single) batch then raises —
            # the "committed but stream-uncheckpointed" crash point
            fail_after=1 if kill else None,
        )

    return _sink


def start_checkpointed_ingest(
    assigned: DataFrame,
    writer: CheckpointedWriter,
    checkpoint_dir: str,
    key: str = "image_id",
    fail_after_commit_of: int | None = None,
):
    """Wire a streaming transformation chain (e.g.
    ``ingest.assign_images_stream``) into the checkpointed sink with
    available-now triggering. Returns the started query."""
    return (
        assigned.writeStream.foreachBatch(
            checkpointed_sink(writer, key=key,
                              fail_after_commit_of=fail_after_commit_of,
                              checkpoint_dir=checkpoint_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_index_ingest(
    embeddings: DataFrame,
    centroids: DataFrame,
    writer: CheckpointedWriter,
    checkpoint_dir: str,
    cid: str = "cid",
    cvec: str = "cvec",
    codewords: list | None = None,
    m: int = 8,
    residual: bool = True,
    fail_after_commit_of: int | None = None,
):
    """Continuous ANN-index ingest (r05): per micro-batch, coarse-
    assign ONLY the epoch's delta (``similarity.ivf_assign`` —
    broadcast centroids, map-side ``max_by``, shuffle of delta-sized
    rows only) and commit the assignments as ONE checkpoint batch
    through the manifest sink. This composes the streaming
    exactly-once protocol with the incremental-index story: a replayed
    epoch after a crash is skipped by the manifest anti-join, so the
    served index holds every ingested vector exactly once — the
    maintenance path for a continuously-ingesting 10¹²-vector corpus
    where a rebuild per batch is impossible. The assignment must run
    INSIDE ``foreachBatch`` (on the epoch's batch frame): as a
    pre-sink stream transformation its groupBy would compile to a
    stateful streaming aggregation, which is the wrong machine for a
    per-delta coarse quantization. With ``codewords`` each epoch is
    residual-PQ-ENCODED instead (``ivfpq_encode`` — codes ride the
    same assignment pass), so the streamed index serves
    ``ivfpq_topk(encoded=...)`` directly. Serving reads
    ``read_stream_index`` — never a rescan of earlier epochs."""
    from ..operators.similarity import ivf_assign, ivfpq_encode

    sink0 = checkpointed_sink(
        writer, key=cid, fail_after_commit_of=fail_after_commit_of,
        checkpoint_dir=checkpoint_dir,
    )

    def _sink(df: DataFrame, epoch_id: int) -> None:
        idx = (
            ivf_assign(df, centroids, cid=cid, cvec=cvec)
            if codewords is None
            else ivfpq_encode(df, centroids, codewords, m,
                              cid=cid, cvec=cvec, residual=residual)
        )
        sink0(idx, epoch_id)

    return (
        embeddings.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_index(
    writer: CheckpointedWriter, base: DataFrame | None = None
) -> DataFrame:
    """Committed stream-ingested IVF assignments as a serving
    ``lists=`` frame for ``ivf_topk`` (columns ``cid, list_id, _cv``;
    the ``batch`` partition column is dropped). ``base`` unions an
    existing persisted index (``similarity.read_ivf_index``) under the
    stream-ingested epochs, so serving sees base + every COMMITTED
    epoch and never an uncommitted or replayed one — the manifest is
    the single source of index-membership truth."""
    idx = writer.read_committed().drop("batch")
    if base is not None:
        idx = base.select(*idx.columns).unionByName(idx)
    return idx


def start_pyramid_ingest(
    leaf_stream: DataFrame,
    base_levels,
    writer: CheckpointedWriter,
    checkpoint_dir: str,
    agg: str = "mean",
    fail_after_commit_of: int | None = None,
):
    """Continuous overview maintenance (r05): per micro-batch, apply
    the epoch's leaf-tile delta to the CURRENT pyramid state and
    commit only the changed tiles (delta leaves + recomputed
    ancestors, O(|delta|·depth) rows) as ONE checkpoint batch — the
    log-structured composition of the exactly-once stream sink with
    ``pyramid.pyramid_delta``. A replayed epoch after a crash is
    skipped by the manifest anti-join (its rows are already
    committed), so every tile version exists exactly once and the
    resolved pyramid equals a batch rebuild over the final leaves
    (asserted in tests/test_stream_pyramid.py, including kill+replay).

    ``base_levels`` is a callable ``() -> dict[int, DataFrame]``
    returning the persisted base pyramid (re-read per epoch so each
    epoch resolves against base + every PRIOR committed epoch).
    The delta computation runs INSIDE ``foreachBatch`` — on the
    epoch's batch frame, where plain joins/groupBys apply (a pre-sink
    stream transformation would compile the rollup's groupBy to a
    stateful streaming aggregation, the wrong machine)."""
    from ..operators.pyramid import pyramid_delta

    sink0 = checkpointed_sink(
        writer, key="cell", fail_after_commit_of=fail_after_commit_of,
        checkpoint_dir=checkpoint_dir,
    )

    def _sink(df: DataFrame, epoch_id: int) -> None:
        levels = read_stream_pyramid(writer, base_levels())
        changed = pyramid_delta(levels, df.select("cell", "band", "tile", "ts"), agg)
        sink0(changed, epoch_id)

    return (
        leaf_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_pyramid(
    writer: CheckpointedWriter, base_levels: dict
) -> dict:
    """Resolve the serving pyramid from base levels + committed
    epochs: per (level, cell, band) the LATEST committed version wins
    (``max_by`` on the epoch id — the log-structured read), tiles
    never committed fall through to the base. Uncommitted or replayed
    epochs are invisible: the manifest is the single source of
    version-membership truth. The log is read from the partitioned
    root (ONE scan with partition pruning on the committed-id filter
    — ``read_committed`` reads batch dirs directly and so drops the
    ``batch`` column the version resolution needs)."""
    done = sorted(writer.committed())
    if not done:  # nothing committed yet — first epoch
        return dict(base_levels)
    spark = next(iter(base_levels.values())).sparkSession
    committed = spark.read.parquet(writer.out).where(F.col("batch").isin(done))
    out = {}
    for z, df in base_levels.items():
        latest = (
            committed.filter(F.col("level") == z)
            .groupBy("cell", "band")
            .agg(F.max_by(F.struct("tile", "ts"), F.col("batch")).alias("_t"))
            .select("cell", "band", F.col("_t.tile").alias("tile"),
                    F.col("_t.ts").alias("ts"))
        )
        out[z] = (
            df.select("cell", "band", "tile", "ts")
            .join(latest.select("cell", "band"), ["cell", "band"], "left_anti")
            .unionByName(latest)
        )
    return out
