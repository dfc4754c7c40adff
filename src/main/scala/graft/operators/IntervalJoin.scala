package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pure (non-equi) interval containment join, made shuffle-joinable.
  *
  * Spark plans `point BETWEEN start AND end` with no equi key as a
  * nested-loop join — broadcastable only while one side is small, O(n·m)
  * otherwise. The standard scale-out is axis bucketing: points get their
  * bucket `⌊t/w⌋`, intervals EXPLODE into every bucket they touch, and the
  * join becomes an equi join on the bucket id followed by the exact
  * containment filter. Each (point, interval) match occurs in exactly one
  * bucket — the point's — so no dedup pass is needed. Cost is
  * shuffle(points) + shuffle(intervals × avg buckets per interval): with
  * `w` near the typical interval length the blow-up factor is ~2, and both
  * sides hash-partition — the shape that survives two fact-sized inputs at
  * 100 TB. Skewed buckets (a hot hour) are ordinary join skew — AQE
  * splits them.
  */
object IntervalJoin {

  /** Join `points` (`tsCol`) to `intervals` (`[startCol, endCol]`, both
    * inclusive, same units) on containment. All three columns must be
    * non-negative numerics in the same scale; `bucket` is the axis width
    * in those units. */
  def byBucket(points: DataFrame, tsCol: String, intervals: DataFrame,
      startCol: String, endCol: String, bucket: Long): DataFrame = {
    val pb = points.withColumn("__bucket", (col(tsCol) / bucket).cast("long"))
    val ib = intervals.withColumn("__bucket",
      explode(sequence((col(startCol) / bucket).cast("long"),
        (col(endCol) / bucket).cast("long"))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Incident-window analytics: the 20 highest-value purchases each open a
    * 2-hour window; count ALL events (any user — deliberately no equi
    * key) inside each window via the bucketed interval join. */
  def q79IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
    val windows = e.filter(col("event_type") === "purchase")
      .orderBy(col("value").desc, col("event_id")).limit(20)
      .select(col("event_id").as("window_id"), col("ts_us").as("w_start"),
        (col("ts_us") + 7200000000L).as("w_end"))
    byBucket(e.select(col("ts_us")), "ts_us",
      windows, "w_start", "w_end", 3600000000L)
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_in_window"))
  }

  val q79Sql: String =
    """WITH w AS (
      |  SELECT event_id AS window_id, epoch_us(ts) AS w_start,
      |         epoch_us(ts) + 7200000000 AS w_end
      |  FROM events WHERE event_type = 'purchase'
      |  ORDER BY value DESC, event_id LIMIT 20)
      |SELECT window_id, CAST(count(*) AS BIGINT) AS n_in_window
      |FROM w JOIN (SELECT epoch_us(ts) AS ts_us FROM events) e
      |  ON e.ts_us >= w.w_start AND e.ts_us <= w.w_end
      |GROUP BY window_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q79_interval_join", q79IntervalJoin, Some(q79Sql)))
}
