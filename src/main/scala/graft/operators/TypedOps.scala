package graft.operators

import graft.Tables
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` surface: case-class rows, compile-time-checked
  * transformations, and a custom typed [[Aggregator]] — the API tier for
  * pipelines where schema mistakes should fail at compile time, not at
  * analysis time. The physical plans are identical to the DataFrame forms
  * (Catalyst sees through the encoders for column-based operations), so
  * nothing here trades performance for safety; the spec pins the typed
  * results to the untyped q01/q19 queries.
  */
object TypedOps {

  /** Typed projection of the lineitem columns the pricing summary needs. */
  final case class LineItem(
      l_returnflag: String,
      l_linestatus: String,
      l_quantity: Double,
      l_extendedprice: Double,
      l_discount: Double)

  final case class PricingRow(
      l_returnflag: String,
      l_linestatus: String,
      sum_qty: Double,
      n: Long)

  def lineitems(s: SparkSession, dir: String): Dataset[LineItem] = {
    implicit val enc: Encoder[LineItem] = Encoders.product[LineItem]
    Tables.lineitem(s, dir)
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount")
      .as[LineItem]
  }

  /** Custom typed Aggregator: exact sum of a money field via long cents —
    * the typed twin of [[graft.functions.Exact.fsum]]. The buffer is a
    * primitive Long (exact, associative, partition-order independent);
    * the result converts once at the end. */
  final class CentsSum(get: LineItem => Double)
      extends Aggregator[LineItem, Long, Double] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: LineItem): Long =
      b + math.floor(get(a) * 100.0 + 0.5).toLong
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Double = r / 100.0
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Typed pricing summary: filter/groupByKey/agg with case classes and
    * the custom Aggregator — compile-time checked end to end. */
  def pricingTyped(s: SparkSession, dir: String): Dataset[PricingRow] = {
    implicit val tupleEnc: Encoder[(String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val outEnc: Encoder[PricingRow] = Encoders.product[PricingRow]
    lineitems(s, dir)
      .filter(li => li.l_quantity > 0)
      .groupByKey(li => (li.l_returnflag, li.l_linestatus))
      .agg(
        new CentsSum(_.l_quantity).toColumn.name("sum_qty"),
        count(lit(1)).as("n").as[Long](Encoders.scalaLong))
      .map { case ((flag, status), sumQty, n) =>
        PricingRow(flag, status, sumQty, n)
      }
  }

  /** Typed twin of q19 (HAVING): object-level filter AFTER a typed agg. */
  final case class CustOrders(o_custkey: Long, n_orders: Long)

  def bigCustomersTyped(s: SparkSession, dir: String): Dataset[CustOrders] = {
    implicit val enc: Encoder[CustOrders] = Encoders.product[CustOrders]
    implicit val l: Encoder[Long] = Encoders.scalaLong
    Tables.orders(s, dir).select(col("o_custkey").as[Long](l))
      .groupByKey(identity)
      .count()
      .map { case (k, n) => CustOrders(k, n) }
      .filter(_.n_orders >= 10)
  }
}
