package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * A shuffle join on a key with hot values (one user with 10^8 events,
  * one very common shingle) puts an entire hot key in one task. AQE's
  * skew-join split handles sort-merge joins; `saltedJoin` is the explicit
  * form that also works for aggregations feeding joins and when AQE
  * statistics miss (e.g. exploded intermediates at 100 TB).
  *
  * Mechanics: the skewed (left) side gets a deterministic salt in
  * [0, n); the compact right side is replicated n×; the join key becomes
  * (key, salt) so a hot key spreads over n tasks. Results are identical
  * to the unsalted join — replication guarantees every (left, right)
  * match still meets exactly once.
  */
object Skew {

  /** Inner equi-join with the left side salted `n` ways. `salt` defaults
    * to a hash of the whole left row (cheap, deterministic, uniform). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      n: Int, saltExpr: Option[Column] = None): DataFrame = {
    val salt = saltExpr.getOrElse(
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(n)))
    val l = left.withColumn("_salt", salt)
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    l.join(r, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
