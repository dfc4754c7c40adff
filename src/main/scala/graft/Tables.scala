package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed table loaders for the driver's synthetic star schema
  * (see TESTDATA.md). Mirrors the reference's data-lake access pattern —
  * `spark.read.format("parquet").load(path)` (reference `etl.py:103`) — as
  * plain vectorized parquet scans. Column pruning + filter pushdown happen
  * in Catalyst; callers select only what they need so `ReadSchema` stays
  * narrow at 100 TB.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. Read it as a long and truncate to µs (integer `div`) — the
    * same truncation DuckDB applies when it reads ns into its µs
    * TIMESTAMP, so both engines see identical values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
