package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution: fuzzy record matching under an edit-distance bound
  * — the "same customer typed twice" / "same author, two spellings"
  * problem a curation pipeline hits when joining records that lack a
  * shared key. Classic blocking formulation (Fellegi–Sunter style
  * candidate generation): records only compare within a block, so the
  * quadratic verify is bounded by the largest block, not the corpus.
  */
object Entity {

  /** Fuzzy duplicate pairs: records sharing `blockCols` whose `strCol`
    * values are within `maxDist` Levenshtein edits. Each unordered pair
    * is emitted once (`a_id < b_id`) with its exact distance.
    *
    * Scale shape:
    *  - the self-join shuffles (id, string, block) only — callers pick
    *    `strCol` as the match key, never a payload column;
    *  - `abs(len(a) − len(b)) ≤ maxDist` prunes before the O(len·maxDist)
    *    dynamic program runs — lossless, since edit distance is bounded
    *    below by the length difference;
    *  - the bounded-distance verify is the native
    *    [[graft.functions.TextExpressions.EditDistanceWithin]] kernel:
    *    common-affix strip + banded DP, `levenshtein(a, b, threshold)`
    *    semantics at a fraction of its cost on the near-identical
    *    strings a fuzzy-match block contains by construction;
    *  - blocks above `hotBlockCap` rows go through the lossless
    *    grid-salted self-join the dedup pipelines use ([[Dedup]]): a row
    *    with group g replicates to cells (g,·)/(·,g), every pair meets in
    *    exactly one cell, and the same candidate set spreads over G²
    *    tasks instead of pinning an N² cell on one reduce task. Hot-block
    *    detection map-side-combines to block sizes; the driver holds at
    *    most 64 (block, n) rows — the bounded-collect class.
    */
  def editDistancePairs(records: DataFrame, maxDist: Int,
                        idCol: String, strCol: String,
                        blockCols: Seq[String],
                        hotBlockCap: Int = 100000,
                        probePartitions: Int = 0): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns are the scale contract")
    val slim = records.select(
      (col(idCol).as("id") +: col(strCol).as("s") +:
        blockCols.map(c => col(c))): _*)
    // When `records` is dimension-sized, the other side broadcasts and
    // the probe side's SCAN parallelism caps the whole pair generation —
    // a table under files.maxPartitionBytes is ONE task doing every DP.
    // probePartitions > 0 spreads it round-robin first (a shuffle of the
    // slim columns only; pointless — leave 0 — when the probe side is
    // large enough to arrive in many splits).
    val probe = if (probePartitions > 0) slim.repartition(probePartitions) else slim
    val a = probe.toDF(("a_id" +: "a_s" +: blockCols): _*)
    val b = slim.toDF(("b_id" +: "b_s" +: blockCols): _*)
    // single-column fingerprint of the block key, used ONLY to route
    // rows to the hot (salted) vs cold path — the joins below always
    // include the real block columns, so a fingerprint collision merely
    // salts an extra block, never crosses blocks.
    def bk(df: DataFrame) = xxhash64(blockCols.map(df(_)): _*)
    val hotRows = slim.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > hotBlockCap)
      .select(xxhash64(blockCols.map(col): _*).as("bk"), col("n"))
      .orderBy(col("n").desc, col("bk")).limit(64).collect()
    val joined =
      if (hotRows.isEmpty) a.join(b, blockCols)
      else {
        val hot = hotRows.map(_.getLong(0)).toSeq
        val maxN = hotRows.map(_.getLong(1)).max
        val grid = math.min(32L, (maxN + hotBlockCap - 1) / hotBlockCap).toInt
        val cold = a.filter(!bk(a).isin(hot: _*))
          .join(b.filter(!bk(b).isin(hot: _*)), blockCols)
        val aHot = a.filter(bk(a).isin(hot: _*))
          .withColumn("g1", pmod(xxhash64(col("a_id")), lit(grid.toLong)))
          .withColumn("g2", explode(sequence(lit(0L), lit(grid - 1L))))
        val bHot = b.filter(bk(b).isin(hot: _*))
          .withColumn("g2", pmod(xxhash64(col("b_id")), lit(grid.toLong)))
          .withColumn("g1", explode(sequence(lit(0L), lit(grid - 1L))))
        cold.unionByName(
          aHot.join(bHot, blockCols ++ Seq("g1", "g2")).drop("g1", "g2"))
      }
    joined
      .filter(col("a_id") < col("b_id"))
      .filter(abs(length(col("a_s")) - length(col("b_s"))) <= maxDist)
      .withColumn("dist", graft.functions.TextExpressions
        .editDistanceWithin(col("a_s"), col("b_s"), maxDist))
      .filter(col("dist") >= 0) // bounded form yields −1 above threshold
      .select(col("a_id"), col("b_id"), col("dist"))
  }
}
