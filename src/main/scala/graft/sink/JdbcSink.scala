package graft.sink

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SaveMode}

/** K1-K4 + K9: relational persistence.
  *
  * The reference's only DataFrame write path is
  * `PostgresConnector.save_dataframe(df, table, mode)` — called at
  * `spark_processor/stream_processor.py:310,346,414` but never defined
  * (its connector only has row-level `execute_query`/`batch_insert`,
  * `storage/postgres_connector.py:44-77`). This object is that method
  * implemented honestly on Spark's JDBC writer, plus the idempotent
  * upsert the reference's update-mode → append-mode pipelines actually
  * need (SURVEY.md §7.4.1: appending update-mode revisions duplicates
  * window rows; upsert keyed on the window/dimension columns fixes it).
  */
object JdbcSink {

  final case class JdbcConfig(url: String, user: String, password: String,
                              driver: String = "org.postgresql.Driver") {
    def properties: Properties = {
      val p = new Properties()
      p.setProperty("user", user)
      p.setProperty("password", password)
      p.setProperty("driver", driver)
      p
    }
  }

  /** T5: shared retry with exponential backoff — the pattern the reference
    * copy-pastes around every sink write (`stream_processor.py:305-324`,
    * `341-360`, `371-402`, `409-428`), factored once.
    */
  def retry[T](attempts: Int = 3, baseDelayMs: Long = 1000L)(f: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch {
        case e: Throwable =>
          last = e
          i += 1
          if (i < attempts) Thread.sleep(baseDelayMs * (1L << (i - 1)))
      }
    }
    throw last
  }

  /** The missing `save_dataframe`: plain JDBC append/overwrite. NOT
    * retried internally — StreamRunner wraps every sink in `retry` already
    * (nesting the two would multiply attempts); batch callers wrap with
    * `JdbcSink.retry` themselves if they want the policy.
    */
  def saveDataFrame(df: DataFrame, table: String, cfg: JdbcConfig,
                    mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).jdbc(cfg.url, table, cfg.properties)

  /** Idempotent upsert: `INSERT … ON CONFLICT (keys) DO UPDATE` executed
    * per partition on the executors (no driver collect). Correct target
    * for update-mode streaming output where later triggers revise rows.
    */
  def upsert(df: DataFrame, table: String, keyCols: Seq[String], cfg: JdbcConfig): Unit = {
    val sql = upsertSql(table, df.columns.toSeq, keyCols)
    val (url, props) = (cfg.url, cfg.properties)
    val cols = df.columns.toSeq
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            cols.indices.foreach(i => st.setObject(i + 1, r.get(i)))
            st.addBatch()
            n += 1
            if (n % 1000 == 0) st.executeBatch()
          }
          st.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** The upsert statement. All-key schemas (nothing to revise) fall back
    * to `DO NOTHING` — `DO UPDATE SET` with an empty assignment list is a
    * syntax error.
    */
  private[sink] def upsertSql(table: String, cols: Seq[String],
                              keyCols: Seq[String]): String = {
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"key columns $keyCols must be a subset of $cols")
    val nonKeys = cols.filterNot(keyCols.contains)
    val conflict =
      if (nonKeys.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + nonKeys.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keyCols.mkString(", ")}) $conflict"
  }

  /** Portable upsert for engines without `ON CONFLICT` (Derby, DB2-family):
    * per row, UPDATE the non-key columns first and INSERT only when no row
    * matched. Executed per partition on the executors, batched per
    * transaction. Correct under the single-writer-per-key discipline of
    * the streaming sinks (`foreachBatch` runs one batch at a time per
    * query); concurrent writers racing on the same NEW key need the
    * native-dialect path ([[upsert]]).
    */
  def upsertPortable(df: DataFrame, table: String, keyCols: Seq[String],
                     cfg: JdbcConfig): Unit = {
    val cols = df.columns.toSeq
    val nonKeys = cols.filterNot(keyCols.contains)
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"key columns $keyCols must be a subset of $cols")
    require(nonKeys.nonEmpty,
      "all-key schemas have nothing to revise — use plain append or the native upsert")
    val updateSql = s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} " +
      s"WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")}"
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val (url, props) = (cfg.url, cfg.properties)
    val nonKeyIdx = nonKeys.map(cols.indexOf)
    val keyIdx = keyCols.map(cols.indexOf)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          // setAutoCommit + prepare sit INSIDE the rollback scope: a
          // prepare failure (e.g. schema drift invalidating the SQL) must
          // also roll back, or Derby's close() throws over the root cause
          try {
            conn.setAutoCommit(false)
            val upd = conn.prepareStatement(updateSql)
            val ins = conn.prepareStatement(insertSql)
            rows.foreach { r =>
              (nonKeyIdx ++ keyIdx).zipWithIndex.foreach { case (c, i) =>
                upd.setObject(i + 1, r.get(c))
              }
              if (upd.executeUpdate() == 0) {
                cols.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
                ins.executeUpdate()
              }
            }
            conn.commit()
          } catch {
            case e: Throwable =>
              // roll back before close: embedded Derby refuses to close a
              // connection mid-transaction, which would mask the root cause
              try conn.rollback() catch { case _: java.sql.SQLException => }
              throw e
          }
        } finally conn.close()
      }
    }
  }

  /** K9 read side: table-or-query load through Spark's JDBC source
    * (predicate pushdown + partitioned reads come builtin).
    */
  def read(spark: org.apache.spark.sql.SparkSession, tableOrQuery: String,
           cfg: JdbcConfig): DataFrame =
    spark.read.jdbc(cfg.url, tableOrQuery, cfg.properties)
}
