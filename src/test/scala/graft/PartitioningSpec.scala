package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-layout scale techniques: bucketed co-located joins (no shuffle
  * on the join key) and partition pruning on hive-style layouts. These are
  * the mechanisms that keep 100 TB joins/scans bounded; the specs assert
  * the *plan* properties, not just results.
  */
class PartitioningSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed tables join without a shuffle on the bucket key") {
    // warehouse.dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and are dropped below
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    sources.Lake.writeBucketed(orders, "orders_b", 8,
      Seq("o_orderkey"), Seq("o_orderkey"))
    sources.Lake.writeBucketed(lineitem, "lineitem_b", 8,
      Seq("l_orderkey"), Seq("l_orderkey"))
    try {
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    joined.collect() // force plan finalization under AQE
    val p = plan(joined)
    val exchanges = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)"
      .r.findAllIn(p).size
    assert(exchanges == 0, s"expected shuffle-free bucketed join, plan:\n$p")
    // same join unbucketed DOES shuffle both sides
    val unbucketed = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    unbucketed.collect()
    assert("Exchange hashpartitioning\\((l_orderkey|o_orderkey)"
      .r.findAllIn(plan(unbucketed)).size >= 1 ||
      plan(unbucketed).contains("BroadcastHashJoin"))
    // and the results agree
    assert(joined.exceptAll(unbucketed).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("hive-layout reads prune partitions from a selective filter") {
    val dir = Files.createTempDirectory("prune").toFile.getAbsolutePath
    val events = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
    events.write.partitionBy("day").mode("overwrite").parquet(s"$dir/events_p")
    val read = spark.read.parquet(s"$dir/events_p")
      .filter(col("day") === lit("2024-01-05").cast("date"))
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    val n = read.count()
    val want = events.filter(to_date(col("ts")) === lit("2024-01-05").cast("date")).count()
    assert(n == want && n > 0)
  }

  test("dynamic partition pruning: a dim filter prunes the fact scan at runtime") {
    // the 100 TB star-join shape: the fact table is partitioned by a key
    // whose selective values are only known through a DIM filter — static
    // pruning can't help, so Spark injects a runtime subquery
    // (dynamicpruningexpression) that evaluates the dim side first and
    // prunes fact partitions before scanning them
    val dir = Files.createTempDirectory("dpp").toFile.getAbsolutePath
    val events = Tables.events(spark, sfDir).withColumn("day", to_date(col("ts")))
    events.write.partitionBy("day").mode("overwrite").parquet(s"$dir/fact")
    // the dim filter must be a shape Spark's isLikelySelective recognizes
    // (string equality here) — a bare boolean column is not considered a
    // selective predicate and suppresses the DPP injection
    val days = events.select(col("day")).distinct()
      .withColumn("label",
        when(col("day") === lit("2024-01-05").cast("date"), "hot")
          .otherwise("cold"))
    days.write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("label") === "hot")
    val joined = fact.join(dim, Seq("day")).groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"),
      s"expected runtime partition pruning in plan:\n$p")
    val want = events.filter(col("day") === lit("2024-01-05").cast("date"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      want.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    assert(joined.count() > 0)
  }
}
