package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog application — the MERGE/upsert-compaction step between a CDC
  * feed (Debezium-shaped inserts/updates/deletes) and a queryable
  * snapshot; the batch form of what Delta `MERGE INTO` / Hudi upsert /
  * Flink changelog compaction do. Last-writer-wins: for every key, the
  * change with the greatest ordering wins, and a winning tombstone removes
  * the key from the snapshot entirely (earlier versions must NOT
  * resurrect).
  *
  * Scale shape: ONE keyed shuffle. The winner per key is picked by
  * `max_by(payload, ordering)` — an algebraic aggregate that combines
  * map-side, so each map task ships at most one row per key it saw,
  * regardless of how many versions of the key the log holds. The window
  * formulation (`row_number` over key/ordering) would shuffle AND sort the
  * FULL change stream; on a 100 TB backlog with hot keys (an entity
  * updated millions of times) that is the difference between a bounded
  * exchange and a skewed sort. The tombstone filter runs AFTER the winner
  * is extracted — one scan over ≤ |keys| rows.
  */
object Cdc {

  /** Kafka-style log compaction: the winning change per key under the
    * lexicographic `ordering` (later = greater), TOMBSTONES INCLUDED.
    * This is the state an incremental consumer must carry — see
    * [[mergeCompacted]] for why deletes cannot be dropped here.
    */
  def compactedLog(log: DataFrame, keys: Seq[String],
                   ordering: Seq[String]): DataFrame = {
    val payload = struct(log.columns.map(col).toIndexedSeq: _*)
    val ord = struct(ordering.map(col).toIndexedSeq: _*)
    log.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(max_by(payload, ord).as("__last"))
      .select(col("__last.*"))
  }

  /** Apply a changelog: latest row per `keys` under `ordering`, then drop
    * keys whose winning row satisfies `isDelete` (evaluated against the
    * surviving row's columns). Output columns = input columns, one row
    * per surviving key. This is the SNAPSHOT view; a consumer that will
    * fold further batches must keep [[compactedLog]] instead.
    */
  def applyChangelog(log: DataFrame, keys: Seq[String], ordering: Seq[String],
                     isDelete: Column): DataFrame =
    compactedLog(log, keys, ordering).filter(!isDelete)

  /** Incremental fold — the day-2 shape: merge a new change batch into a
    * STANDING compacted log without re-reading history. Winners compose
    * (max_by is associative over the union), so
    * `mergeCompacted(compactedLog(a), b) ≡ compactedLog(a ∪ b)` exactly.
    *
    * The standing side must be the TOMBSTONE-RETAINING [[compactedLog]],
    * not the filtered snapshot: if batch 1's winner for key k is a delete
    * at seq 5 and batch 2 carries a LATE update at seq 3, folding against
    * the snapshot (where k is absent) would resurrect k — folding against
    * the compacted log keeps the seq-5 tombstone as the winner. Tombstone
    * rows are garbage-collectible only once the feed's lateness bound
    * (watermark/retention) has passed — the same contract as Kafka
    * compacted-topic `delete.retention.ms`.
    *
    * Scale shape: one keyed shuffle of |state| + |batch| rows. With the
    * standing log stored bucketed by the key (the natural layout for a
    * state table), the union aggregation co-locates and only the batch
    * moves. A streaming deployment is this fold inside `foreachBatch`
    * (CdcSpec drives it end-to-end over a MemoryStream).
    */
  def mergeCompacted(compacted: DataFrame, batch: DataFrame,
                     keys: Seq[String], ordering: Seq[String]): DataFrame =
    compactedLog(compacted.unionByName(batch), keys, ordering)

  /** [[mergeCompacted]] against a STATIONARY state table — the physical
    * form the fold's scale note promises: with the standing compacted
    * log stored BUCKETED on the key ([[Bucketed.ensure]]), folding a
    * batch must not re-shuffle the state. The union-then-aggregate form
    * can't deliver that (an aggregate over a union has no usable child
    * distribution — BOTH sides exchange), so the stationary form
    * restates the fold as: compact the batch alone (the only keyed
    * shuffle, |batch|-sized), then FULL OUTER JOIN the two compacted
    * logs on the key — the bucketed standing side satisfies the join's
    * distribution from its layout and scans exchange-free (CdcSpec
    * asserts the plan) — and pick the per-key winner by comparing the
    * `ordering` structs. Ties keep the STANDING row: a redelivered
    * identical change is a no-op, exactly [[compactedLog]]'s max_by
    * semantics. Algebraically identical to
    * `mergeCompacted(standing, batch)` (spec + the shared oracle).
    * Keys must be non-null (CDC keys are entity identifiers) — side
    * absence in the outer join is detected by a null key.
    */
  def mergeCompactedStationary(standing: DataFrame, batch: DataFrame,
                               keys: Seq[String],
                               ordering: Seq[String]): DataFrame = {
    val cols = standing.columns.toSeq
    val b = compactedLog(batch, keys, ordering)
    val sA = standing.as("s")
    val bA = b.as("b")
    // plain equality, NOT null-safe <=>: keys are non-null by contract,
    // and a null-safe condition makes the join cluster on a wrapped key
    // expression the bucketed layout cannot satisfy — the state side
    // would re-shuffle, defeating the operator's whole point
    val cond = keys.map(k => col(s"s.$k") === col(s"b.$k")).reduce(_ && _)
    val sOrd = struct(ordering.map(o => col(s"s.$o")).toIndexedSeq: _*)
    val bOrd = struct(ordering.map(o => col(s"b.$o")).toIndexedSeq: _*)
    val sRow = struct(cols.map(c => col(s"s.$c")).toIndexedSeq: _*)
    val bRow = struct(cols.map(c => col(s"b.$c")).toIndexedSeq: _*)
    sA.join(bA, cond, "full_outer")
      .select(when(col(s"s.${keys.head}").isNull, bRow)
        .when(col(s"b.${keys.head}").isNull, sRow)
        .when(bOrd > sOrd, bRow)
        .otherwise(sRow).as("__w"))
      .select(col("__w.*"))
  }

  /** Tombstone GC for a [[compactedLog]] state table — the
    * `delete.retention.ms` contract [[mergeCompacted]]'s scaladoc cites,
    * as an operator. A tombstone must be RETAINED while a change older
    * than it can still arrive (dropping it early would let that late
    * change resurrect the deleted key); once the feed's lateness bound
    * has passed — `expired`, e.g. `col("ts") < watermark` — every future
    * change for the key carries a NEWER ordering, beats the tombstone in
    * [[mergeCompacted]] anyway, and the tombstone row is pure state
    * weight. So: drop exactly the expired tombstones. Folding any batch
    * whose orderings are at-or-after the bound into the vacuumed state
    * yields the identical snapshot as folding into the un-vacuumed state
    * (CdcSpec proves it; the `ev_cdc_vacuum` oracle hash-checks it on
    * real data), and a late change still INSIDE the bound keeps hitting
    * the retained tombstone — no resurrection. Narrow filter, no
    * shuffle; at 100 TB this is what keeps the compacted state from
    * accreting one row per deleted key forever.
    */
  def vacuumTombstones(compacted: DataFrame, isDelete: Column,
                       expired: Column): DataFrame =
    // NULL-safe on both predicates: a row whose delete flag or expiry is
    // undecidable (NULL ordering/ts column) must be RETAINED — a plain
    // `!isDelete || !expired` evaluates to NULL on such a row and the
    // filter drops it, GC'ing the tombstone before its lateness bound
    // (a late in-retention change would then resurrect the deleted key)
    compacted.filter(!coalesce(isDelete, lit(false)) ||
      !coalesce(expired, lit(false)))

  /** One micro-batch step of STREAMING changelog compaction — the
    * exactly-once MERGE INTO loop: read the predecessor state
    * ([[VersionedState.latestBelow]] — a redelivered batch cannot see
    * the version its failed attempt published), fold the batch
    * ([[mergeCompacted]] — tombstones retained), optionally GC
    * tombstones past the lateness bound ([[vacuumTombstones]]), publish
    * the next state atomically as `__state_v<batchId>`, and return it.
    * Deterministic fold + versioned publish ⇒ redelivery recomputes and
    * republishes identical state (CdcSpec proves batches ≡ one-shot and
    * redelivery idempotence across the version boundary).
    *
    * Scale shape: the fold is ONE keyed shuffle of |state| + |batch|
    * rows per trigger (see [[mergeCompactedStationary]] for the
    * bucketed-layout variant that moves only the batch); the vacuum is
    * a narrow filter keeping the published state from accreting one
    * tombstone per deleted key forever.
    */
  def streamFold(batch: DataFrame, batchId: Long, statePath: String,
                 keys: Seq[String], ordering: Seq[String],
                 isDelete: Column = lit(false),
                 expired: Column = lit(false)): DataFrame = {
    val spark = batch.sparkSession
    val standing = VersionedState.latestBelow(spark, statePath, batchId)
      .getOrElse(batch.limit(0))
    val next = vacuumTombstones(
      mergeCompacted(standing, batch, keys, ordering), isDelete, expired)
      .localCheckpoint()
    VersionedState.publish(next, statePath, batchId)
    next
  }

  /** Streaming changelog compaction — [[streamFold]] per micro-batch.
    * `sink` receives (compacted state, batchId); the queryable snapshot
    * is `state.filter(!isDelete)`. `expiredFor` maps the batch id to the
    * vacuum bound (a real feed derives it from its watermark); default
    * never vacuums.
    */
  def cdcStream(stream: DataFrame, statePath: String, checkpointDir: String,
                keys: Seq[String], ordering: Seq[String],
                isDelete: Column = lit(false),
                expiredFor: Long => Column = _ => lit(false))
               (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        sink(streamFold(b, id, statePath, keys, ordering,
          isDelete, expiredFor(id)), id)
      }
      .start()
}
