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

  /** Apply a changelog: latest row per `keys` under the lexicographic
    * `ordering` (later = greater), then drop keys whose winning row
    * satisfies `isDelete` (evaluated against the surviving row's columns).
    * Output columns = input columns, one row per surviving key.
    */
  def applyChangelog(log: DataFrame, keys: Seq[String], ordering: Seq[String],
                     isDelete: Column): DataFrame = {
    val payload = struct(log.columns.map(col).toIndexedSeq: _*)
    val ord = struct(ordering.map(col).toIndexedSeq: _*)
    log.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(max_by(payload, ord).as("__last"))
      .select(col("__last.*"))
      .filter(!isDelete)
  }
}
