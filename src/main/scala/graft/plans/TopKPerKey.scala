package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.execution.SparkStrategy

import scala.collection.mutable

/** Per-key top-k as a first-class operator (logical node + strategy +
  * physical exec), registered through `spark.experimental.extraStrategies`.
  *
  * Why custom: Spark expresses "top k rows per key" as
  * `row_number().over(Window.partitionBy(key).orderBy(...)) <= k`, which
  * sorts EVERY key's whole partition. This operator keeps a bounded
  * k-heap per key and runs in two phases like an aggregate — a partial
  * pass before the shuffle (at most k rows per key per input partition
  * leave the map side) and a final pass after clustering by key. At
  * 100 TB with small k this turns a full sort-shuffle of the fact table
  * into a shuffle of ~k·|keys| rows.
  */
object TopKPerKey {

  case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
      k: Int, child: LogicalPlan) extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
      copy(child = c)
  }

  case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
      k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) Seq(UnspecifiedDistribution)
      else Seq(ClusteredDistribution(keys))

    override protected def doExecute(): RDD[InternalRow] = {
      val orderExprs = order
      val keyExprs = keys
      val childOutput = child.output
      val limit = k
      child.execute().mapPartitions({ iter =>
        val ordering = GenerateOrdering.generate(orderExprs, childOutput)
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        // max-heap under `ordering`: the worst retained row sits on top
        val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
        iter.foreach { row =>
          val key = keyProj(row)
          val heap = heaps.get(key) match {
            case Some(h) => h
            case None =>
              val h = mutable.PriorityQueue.empty[UnsafeRow](
                ordering.asInstanceOf[Ordering[InternalRow]]
                  .asInstanceOf[Ordering[UnsafeRow]])
              heaps.put(key.copy(), h)
              h
          }
          if (heap.size < limit) {
            heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
          } else if (ordering.compare(row, heap.head) < 0) {
            heap.dequeue()
            heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
          }
        }
        heaps.valuesIterator.flatMap(_.iterator)
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
      copy(child = c)
  }

  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyPlan(keys, order, k, child) =>
        TopKPerKeyExec(keys, order, k, partial = false,
          TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** User-facing entry point: top `k` rows per `keys` under `order`
    * ((name, descending?) pairs; include a unique tiebreak column for
    * determinism). Columns are resolved here against the input's analyzed
    * output — Spark 4's lazy Column bridge doesn't resolve inside custom
    * logical nodes. */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val child = GraftShims.logicalPlan(df)
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    val sortOrders = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftShims.ofRows(spark,
      TopKPerKeyPlan(keys.map(attr), sortOrders, k, child))
  }
}
