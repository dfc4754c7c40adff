package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory lives in `graft.operators.*` / `graft.multimodal`;
  * each module contributes [[QueryDef]]s (Spark impl + DuckDB oracle SQL).
  * This object is just the wiring the driver harness calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * 4-way join + exact-decimal revenue aggregate (SURVEY §2.3/§2.4). */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q03JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (multimodal binary pipelines) → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    QueryDef.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
