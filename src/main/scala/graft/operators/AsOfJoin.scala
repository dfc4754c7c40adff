package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the payload of the most
  * recent right row with the same keys and right.time <= left.time.
  *
  * Spark has no native as-of join; the scalable formulation is the
  * union-and-window trick — tag both sides, union, one shuffle on
  * (keys, time), then `last(payload ignoring nulls)` over an ordered
  * running frame. No range-condition join (which would plan as a
  * broadcast-nested-loop or explode an equi-prefilter), no per-key
  * collect: wall-clock is one sort-shuffle at any scale, and skewed keys
  * are handled by AQE like any other window.
  *
  * Tie semantics: a right row at exactly left.time IS visible (at-or-
  * before); among right rows with identical (keys, time) the one with the
  * largest tiebreak value wins — pass a unique column (e.g. an id) for
  * deterministic results.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightTiebreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload columns ${payload.intersect(leftCols)} collide with left side")

    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(0))
      .withColumn("_tb", lit(null).cast("long"))
    val lAligned = payload.foldLeft(l)((df, p) =>
      df.withColumn(p, lit(null).cast(
        right.schema(p).dataType)))

    val rAligned = {
      val base = right
        .withColumn("_t", col(rightTime))
        .withColumn("_side", lit(1))
        .withColumn("_tb",
          rightTiebreak.map(col(_).cast("long")).getOrElse(lit(0L)))
      leftCols.filterNot(keys.contains).foldLeft(base)((df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    }

    val all = (keys ++ leftCols.filterNot(keys.contains) ++ payload ++
      Seq("_t", "_side", "_tb")).distinct
    val u = lAligned.select(all.map(col): _*)
      .unionByName(rAligned.select(all.map(col): _*))

    // right rows sort before left rows at equal time (visible at-or-
    // before); later tiebreak wins among identical right times
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").desc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payload.foldLeft(u)((df, p) =>
      df.withColumn(p, last(when(col("_side") === 1, col(p)), ignoreNulls = true).over(w)))

    filled.filter(col("_side") === 0).select((leftCols ++ payload).map(col): _*)
  }
}
