package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operator: a Spark implementation over the testdata
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle query.
  * The driver's correctness gate runs `fn` at sf0.01, runs `oracle` in
  * DuckDB over the same parquet, and hash-compares row sets (columns
  * sorted by name) — so column NAMES and VALUES must match exactly.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def all: Seq[QueryDef] =
    graft.operators.Relational.defs ++
      graft.operators.WindowOps.defs ++
      graft.operators.EventOps.defs ++
      graft.operators.TextOps.defs ++
      graft.operators.DedupOps.defs ++
      graft.operators.SimilarityOps.defs ++
      graft.operators.StatsOps.defs ++
      graft.operators.MiscOps.defs ++
      graft.operators.CurationOps.defs ++
      graft.operators.Skew.defs ++
      graft.operators.GraphOps.defs ++
      graft.operators.IntervalJoin.defs ++
      graft.operators.TypedOps.defs ++
      graft.multimodal.Multimodal.defs
}
