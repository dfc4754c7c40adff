package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Lint class #10 (r12): DUPLICATE EXPENSIVE SUBTREE detection.
  *
  * Spark performs no common-subexpression elimination across DataFrame
  * reuse: two consumers of the same derived frame plan its whole
  * lineage twice. Runtime exchange/stage reuse (ReuseExchange, AQE
  * query-stage reuse) deduplicates work only up to the LAST identical
  * exchange — the map work after it (a join's emit, an expensive
  * projection) re-executes once per consumer. That is exactly what the
  * r10 q152 StageProfile decomposition measured: the
  * `crossJoin(broadcast(total-derived-from-the-same-lineage))` idiom
  * planned the entire pair join twice, two concurrent 8-second copies
  * of the same stage, most of the query's wall (fixed in r11 with a
  * bounded global window; `EventOps` q152 note). This walker finds the
  * SHAPE everywhere instead of waiting for the next StageProfile
  * session.
  *
  * What it flags, per declared query, on the OPTIMIZED logical plan:
  * MAXIMAL duplicated subtrees (by canonicalized plan equality) that
  *
  *  - are EXPENSIVE: contain a Join or an Aggregate AND read at least
  *    one relation leaf (a scan or a checkpoint RDD) — a re-planned
  *    scan→join/agg lineage, not a shared literal frame; and
  *  - have instances under DIFFERENT parent nodes. The two sides of a
  *    SELF-JOIN share the join as parent and are exchange-reused at
  *    runtime (the banded x/y self-joins of the LSH family — identical
  *    exchanges, one execution), so they are deliberately NOT the
  *    class. Two different aggregates over the same lineage ARE: their
  *    divergent shuffles defeat reuse above the common subtree, and
  *    the subtree's final stage runs once per consumer.
  *
  * Maximality: the walk is top-down and does not descend into a
  * reported subtree — children of a duplicate are duplicates by
  * construction and would only add noise.
  *
  * Every hit must be allowlisted in ScaleLintSpec's
  * `boundedDupSubtree` with a NAMED bound ("leaf-cheap re-read",
  * "intended two-pipeline eval", "checkpointed upstream", …) — the
  * same contract as the other nine classes. The at-scale fix idiom for
  * the totals-join instances is the q152 one: replace
  * `crossJoin(broadcast(df.agg(total)))` over a shared lineage with a
  * bounded global window over the already-aggregated (small) frame.
  *
  * KNOWN LIMIT (under-flagging, conservative): consumers that PRUNE
  * different columns diverge the canonical forms above the shared
  * sub-lineage — the audit then flags only the largest EXACTLY-shared
  * subtree, which may be just the (cheap) scan. The planted-violation
  * spec pins the detectable shape; the q202/q232/q233 instances were
  * caught through their exactly-shared inner aggregates.
  *
  * KNOWN LIMIT, by design: lineages hidden behind localCheckpoint
  * leaves (the collapse products, CC outputs) are each materialized
  * ONCE by construction — the checkpoint is the repo's own fix for
  * this class — and LogicalRDD equality is reference-based, so a
  * checkpoint consumed twice canonicalizes equal and is correctly
  * never flagged (reading a materialized RDD twice is cheap by
  * design).
  */
object SubtreeAudit {

  private def isRelationLeaf(p: LogicalPlan): Boolean = p match {
    case _: LogicalRelation => true
    case l: LeafNode =>
      // checkpoint leaves (LogicalRDD) are class-internal; matching by
      // name keeps this file free of private[sql] imports
      l.getClass.getSimpleName == "LogicalRDD"
    case _ => false
  }

  private def isExpensive(p: LogicalPlan): Boolean = {
    var hasWork = false
    var hasLeaf = false
    p.foreach {
      case _: Join | _: Aggregate => hasWork = true
      case n if isRelationLeaf(n) => hasLeaf = true
      case _ => ()
    }
    hasWork && hasLeaf
  }

  /** Maximal duplicated expensive subtrees with divergent parents.
    * Returns one human-readable line per flagged canonical class. */
  def audit(plan: LogicalPlan): Seq[String] = {
    // occurrence count + distinct-parent classes per canonical subtree.
    // Parent identity is the PARENT's canonical form plus which child
    // slot — two sides of one self-join share the parent node itself
    // (reference), which is what distinguishes them from two separate
    // consumers.
    val occurrences = scala.collection.mutable.Map
      .empty[LogicalPlan, scala.collection.mutable.ArrayBuffer[AnyRef]]
    def walk(node: LogicalPlan, parent: AnyRef,
        parentCanonical: LogicalPlan): Unit = {
      val canon = node.canonicalized
      // an alias-only Project canonicalizes EQUAL to its own child, so
      // a canonical-equal ancestor-descendant CHAIN is one occurrence,
      // not a duplicate — only the chain's top registers (found on
      // q232: Project[... _we0 AS cum_n] == its Window child)
      if (canon != parentCanonical)
        occurrences.getOrElseUpdate(canon,
          scala.collection.mutable.ArrayBuffer.empty[AnyRef]) += parent
      node.children.foreach(walk(_, node, canon))
      // subquery expressions re-plan their own lineages; a correlated
      // scalar subquery duplicating the outer lineage is the same class
      node.subqueries.foreach(walk(_, node, canon))
    }
    walk(plan, null, null)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val reported = scala.collection.mutable.Set.empty[LogicalPlan]
    def report(node: LogicalPlan): Unit = {
      val parents = occurrences(node.canonicalized)
      val distinctParents = parents.map(p =>
        if (p == null) "root" else System.identityHashCode(p).toString)
        .distinct
      if (parents.size >= 2 && distinctParents.size >= 2 &&
          isExpensive(node) && !reported.contains(node.canonicalized)) {
        reported += node.canonicalized
        val leaves = node.collectLeaves().map {
            case LogicalRelation(r: HadoopFsRelation, _, _, _, _) =>
              r.location.rootPaths.headOption
                .map(_.getName.stripSuffix(".parquet")).getOrElse("fs")
            case l => l.getClass.getSimpleName
          }
          .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }
          .mkString(", ")
        out += s"dup-subtree x${parents.size}: ${node.getClass.getSimpleName} " +
          s"over [$leaves] (${node.toString.linesIterator.size} plan lines)"
      } else if (parents.size >= 2 && distinctParents.size < 2) {
        // identical siblings under ONE node (a symmetric self-join's
        // two sides, possibly behind optimizer-inserted per-side
        // Projects that are themselves canonically equal): their
        // exchanges canonicalize equal too, so runtime exchange/stage
        // reuse executes the lineage once — a reuse unit, not a
        // duplicate; descend no further (the children are duplicated
        // BY the siblings, not by independent consumers)
        reported += node.canonicalized
      } else if (!reported.contains(node.canonicalized)) {
        node.children.foreach(report)
        node.subqueries.foreach(report)
      }
      // descend no further into a reported subtree: maximality
    }
    report(plan)
    out.toSeq
  }
}
