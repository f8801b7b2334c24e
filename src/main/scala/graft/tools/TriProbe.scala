package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off observability for the triangle contraction: group structure
  * and contracted-graph density of the sf-dir dup graph.
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.ops.Materialize.cached(spark, "jaccard_pairs|lang,source|0.8",
        Seq(s"$dir/documents.parquet")) {
      graft.text.Dedup.prefixJaccardPairs(
        graft.source.Tables(spark, dir, "documents"),
        blockCols = Seq("lang", "source"), threshold = 0.8)
    }.select(col("a_id"), col("b_id"))
    val docs = graft.source.Tables(spark, dir, "documents")
    val groups = docs.select(col("doc_id").as("v_id"),
      md5(concat_ws("|", col("lang"), col("source"),
        concat_ws(" ", array_sort(array_distinct(split(col("text"), "\\s+")))))).as("grp"))
    val e = edges
    val g = groups
    val mapped = e.join(g.select(col("v_id").as("a_id"), col("grp").as("ga")), "a_id")
      .join(g.select(col("v_id").as("b_id"), col("grp").as("gb")), "b_id")
    val he = mapped.filter(col("ga") =!= col("gb"))
      .select(least(col("ga"), col("gb")).as("x"),
        greatest(col("ga"), col("gb")).as("y")).distinct()
    val members = e.select(col("a_id").as("v")).unionAll(e.select(col("b_id"))).distinct()
      .join(g.withColumnRenamed("v_id", "v"), "v")
    val sizes = members.groupBy("grp").count()
    println(s"[probe] edges=${e.count()} verts=${members.count()} " +
      s"groups=${sizes.count()} hEdges=${he.count()}")
    val top = sizes.orderBy(col("count").desc).limit(10)
      .collect().map(_.getLong(1)).mkString(",")
    println(s"[probe] top group sizes: $top")
    val hsym = he.unionAll(he.select(col("y"), col("x")))
    val wm = hsym.groupBy("x").count()
      .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0)
    println(s"[probe] H unoriented wedge mass: $wm")

    // adjacency-twin contraction: closed-neighborhood hash
    val sym = e.select(col("a_id").as("x"), col("b_id").as("y"))
      .unionAll(e.select(col("b_id").as("x"), col("a_id").as("y")))
    val tg = sym.groupBy(col("x"))
      .agg(sort_array(array_union(collect_list(col("y")), array(col("x")))).as("nb"))
      .select(col("x").as("v_id"), md5(concat_ws(",",
        transform(col("nb"), v => v.cast("string")))).as("grp"))
    val m2 = e.join(tg.select(col("v_id").as("a_id"), col("grp").as("ga")), "a_id")
      .join(tg.select(col("v_id").as("b_id"), col("grp").as("gb")), "b_id")
    val he2 = m2.filter(col("ga") =!= col("gb"))
      .select(least(col("ga"), col("gb")).as("x"),
        greatest(col("ga"), col("gb")).as("y")).distinct()
    val sizes2 = tg.groupBy("grp").count()
    println(s"[probe] twin groups=${sizes2.count()} hEdges=${he2.count()}")
    val top2 = sizes2.orderBy(col("count").desc).limit(10)
      .collect().map(_.getLong(1)).mkString(",")
    println(s"[probe] twin top group sizes: $top2")
    val hsym2 = he2.unionAll(he2.select(col("y"), col("x")))
    val wm2 = hsym2.groupBy("x").count()
      .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0)
    println(s"[probe] twin H unoriented wedge mass: $wm2")

    // A/B: direct wedge enumeration vs token-set contraction, 2 reps
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $tag rep $i: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    time("direct    ")(graft.ops.Graph.triangleStats(e))
    time("contracted")(graft.ops.Graph.triangleStatsContracted(e, groups))
    spark.stop()
  }
}
