package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, CurrentRow, Descending, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.execution.SparkStrategy

import scala.collection.mutable

/** Per-key top-k as a first-class operator (logical node + strategy +
  * physical exec + optimizer rewrite), registered through
  * `spark.experimental` (see [[enable]]).
  *
  * Why custom: Spark expresses "top k rows per key" as
  * `row_number().over(Window.partitionBy(key).orderBy(...)) <= k` and since
  * 3.5 prunes it with `WindowGroupLimit` — but that operator still FULLY
  * SORTS every input partition (requiredChildOrdering) on both sides of
  * the shuffle. This operator keeps a bounded k-heap per key instead and
  * runs in two phases like an aggregate — a partial pass before the
  * shuffle (at most k rows per key per input partition leave the map side)
  * and a final pass after clustering by key. At 100 TB with small k this
  * replaces two O(n log n) sorts of the fact table with one O(n log k)
  * streaming pass, and the shuffle carries only ~k·|keys| rows.
  *
  * [[TopKRewrite]] makes SQL/DataFrame users get this for free: it rides
  * on Spark's own rank-filter analysis by matching the `WindowGroupLimit`
  * logical node the built-in optimizer inserts, swapping it for
  * [[TopKPerKeyPlan]] when the rank function is `row_number` (rank/
  * dense_rank keep ties, which a strict k-heap must not cut) and every
  * key/order expression resolves against the child — otherwise it falls
  * back to the built-in operator untouched.
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

    // rows come out in the child's partitioning (the heap pass is
    // per-partition, 1:1) — without this override the default
    // UnknownPartitioning would make EnsureRequirements insert a redundant
    // second Exchange for any downstream key-clustered operator (e.g. the
    // Window that TopKRewrite leaves above this node)
    override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
      child.outputPartitioning

    override lazy val metrics: Map[String, SQLMetric] = Map(
      "numInputRows" -> SQLMetrics.createMetric(sparkContext, "number of input rows"),
      "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
      "numKeys" -> SQLMetrics.createMetric(sparkContext, "number of distinct keys"))

    override protected def doExecute(): RDD[InternalRow] = {
      val orderExprs = order
      val keyExprs = keys
      val childOutput = child.output
      val limit = k
      val inRows = longMetric("numInputRows")
      val outRows = longMetric("numOutputRows")
      val nKeys = longMetric("numKeys")
      child.execute().mapPartitions({ iter =>
        val ordering = GenerateOrdering.generate(orderExprs, childOutput)
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        // max-heap under `ordering`: the worst retained row sits on top
        val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
        iter.foreach { row =>
          inRows += 1
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
        nKeys += heaps.size
        heaps.valuesIterator.flatMap { h => outRows += h.size; h.iterator }
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
      copy(child = c)
  }

  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyPlan(keys, order, k, child) =>
        // defensive: every key/order expression must evaluate against the
        // child's row — a violation here means a buggy construction path
        // (perKey and TopKRewrite both pre-check), so fail loudly rather
        // than at codegen depth
        val refs = (keys ++ order).flatMap(_.references).toSet
        require(refs.subsetOf(child.outputSet.toSet[Attribute]),
          s"TopKPerKey keys/order reference non-child attributes: " +
            s"${(refs -- child.outputSet).mkString(", ")}")
        TopKPerKeyExec(keys, order, k, partial = false,
          TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Optimizer rewrite to [[TopKPerKeyPlan]], matching BOTH plan shapes a
    * `row_number() <= k` window filter passes through the optimizer as —
    * because the two activation paths see the plan at different stages:
    *
    *  - `spark.experimental.extraOptimizations` ([[enable]]) runs as the
    *    LAST optimizer batch, after Spark's "Infer window group limit"
    *    batch — there the pattern is the `WindowGroupLimit` node itself.
    *  - `spark.sql.extensions` / [[graft.GraftExtensions]] injects into
    *    the operator-optimization batch, which runs BEFORE
    *    `InferWindowGroupLimit` has created any `WindowGroupLimit` — there
    *    the pattern is still the raw `Filter(rn <= k, Window(row_number))`
    *    (same conjunct extraction as Spark's own rule). Spark's later
    *    batch then inserts a `WindowGroupLimit` above our node; it
    *    operates on the already-pruned ~k·|keys| rows and shares the
    *    Window's required sort, so it costs one streaming pass of pruned
    *    rows, not a sort of the fact table.
    *
    * In both shapes the surrounding Window/Filter stay and recompute the
    * rank over the pruned rows, so output columns and values are
    * unchanged; the two full sorts of the fact table disappear. Rank-like
    * functions other than `row_number` are left to the built-in operator
    * (they keep boundary ties; a strict k-heap would cut them). */
  object TopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

    /** Smallest row_number bound in `cond`'s conjuncts (`rn <= k`,
      * `rn < k`, `rn = k`, and the literal-first mirror forms), where `rn`
      * is an alias of row_number over the standard running frame. */
    private def rowNumberLimit(cond: Expression,
        windowExprs: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]): Option[Int] = {
      val rnAttrs = windowExprs.collect {
        case a @ Alias(WindowExpression(RowNumber(), WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) =>
          a.toAttribute
      }
      if (rnAttrs.isEmpty) None
      else {
        val limits = splitConjunctivePredicates(cond).collect {
          case LessThan(e, IntegerLiteral(n)) if rnAttrs.exists(e.semanticEquals) => n - 1
          case GreaterThan(IntegerLiteral(n), e) if rnAttrs.exists(e.semanticEquals) => n - 1
          case LessThanOrEqual(e, IntegerLiteral(n)) if rnAttrs.exists(e.semanticEquals) => n
          case GreaterThanOrEqual(IntegerLiteral(n), e) if rnAttrs.exists(e.semanticEquals) => n
          case EqualTo(e, IntegerLiteral(n)) if rnAttrs.exists(e.semanticEquals) => n
          case EqualTo(IntegerLiteral(n), e) if rnAttrs.exists(e.semanticEquals) => n
        }
        if (limits.isEmpty) None else Some(limits.min)
      }
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case WindowGroupLimit(part, order, RowNumber(), limit, child)
          if part.nonEmpty && order.nonEmpty && limit > 0 &&
            (part ++ order).flatMap(_.references)
              .forall(child.outputSet.contains) =>
        TopKPerKeyPlan(part, order, limit, child)
      case f @ Filter(cond, w @ Window(windowExprs, part, order, child, _))
          if part.nonEmpty && order.nonEmpty &&
            !child.isInstanceOf[TopKPerKeyPlan] &&
            !child.isInstanceOf[WindowGroupLimit] &&
            (part ++ order).flatMap(_.references)
              .forall(child.outputSet.contains) =>
        rowNumberLimit(cond, windowExprs) match {
          case Some(k) if k > 0 =>
            f.copy(child = w.copy(child = TopKPerKeyPlan(part, order, k, child)))
          case _ => f
        }
    }
  }

  /** Register the strategy + rewrite on a session (idempotent). After
    * this, plain SQL/DataFrame `row_number() <= k` window filters compile
    * to the heap operator with no API change. */
  def enable(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
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
