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
    * to a hash of the whole left row (cheap, deterministic, uniform).
    *
    * `n = 0` (the default) sizes the salt count to the session's shuffle
    * parallelism CAPPED AT 64 — a pinned count that made sense on a
    * laptop would leave a 1000-executor cluster 8-wide on its hottest
    * key, but matching parallelism exactly is the other failure: every
    * salt replicates the ENTIRE right side, so an uncapped default on a
    * 2000-partition cluster would 2000× a right side that by the
    * documented use case ("medium dim that does not fit a broadcast") is
    * not tiny — the replication would dwarf the skew it cures. 64 salts
    * already spreads any hot key across 64 tasks (the point of
    * diminishing returns for one key); callers with wider single-key
    * hotspots pin `n` explicitly and own the replication cost. The
    * result is salt-count-INVARIANT (replication meets every match
    * exactly once), so `n` is a cost knob, not a correctness one. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      n: Int = 0, saltExpr: Option[Column] = None): DataFrame = {
    val salts = if (n > 0) n
      else math.min(64,
        math.max(2, left.sparkSession.sessionState.conf.numShufflePartitions))
    val salt = saltExpr.getOrElse(
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val l = left.withColumn("_salt", salt)
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Salted join as a declared, oracle-checked query: the events fact
    * (event_type has ~5 values — every key is a hot key) joins a 5-row
    * event-type dim through [[saltedJoin]] with 8 salts, then aggregates.
    * The salt spreads each hot key over 8 tasks in the join shuffle;
    * because replication guarantees every (left, right) match still meets
    * exactly once, the result provably equals the plain join — which IS
    * the oracle, same contract as q71's bloom gate. (With a dim this
    * small Spark would broadcast and salting would be moot; the declared
    * query exists to keep the shuffle-side mechanics under the hash
    * gate — at 100 TB the right side is a medium dim that does not fit a
    * broadcast but has hot keys on the left.) The declared query PINS 8
    * salts so the plan under the hash gate is stable; production callers
    * take the parallelism-sized default, and the result is the same
    * either way (salt-count invariance, spec'd). */
  def q94SaltedJoin(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val e = graft.Tables.events(s, dir)
      .select(col("event_type"), col("user_id"), col("value"))
    val dim = graft.Tables.events(s, dir)
      .select(col("event_type")).distinct()
      .withColumn("type_group",
        when(col("event_type").isin("purchase", "signup"), "conversion")
          .otherwise("engagement"))
    saltedJoin(e, dim, "event_type", 8)
      .groupBy(col("type_group"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Exact.fsum(col("value")).as("sum_value"))
  }

  /** The oracle is the join-free aggregate, which would KEEP null-key
    * rows a real (salted or not) inner join drops — so it filters them
    * explicitly to mirror inner-join semantics. No-op on the driver's
    * null-free corpus; required for parity under the events fuzz. */
  val q94Sql: String =
    """SELECT CASE WHEN event_type IN ('purchase', 'signup')
      |         THEN 'conversion' ELSE 'engagement' END AS type_group,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE event_type IS NOT NULL
      |GROUP BY 1""".stripMargin

  def defs: Seq[graft.QueryDef] = Seq(
    graft.QueryDef("q94_salted_join", q94SaltedJoin, Some(q94Sql)))
}
