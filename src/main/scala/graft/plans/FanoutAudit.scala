package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Lint class #9 (r11): FAN-OUT BLINDNESS detection — the static sweep
  * behind the r8–r10 discovery that AQE sizes shuffle partitions and its
  * skew split by INPUT bytes, so a join whose OUTPUT multiplies (exact-dup
  * expansion, triangle wedges at a hub, contamination grams over
  * duplicated pages) can run its entire superlinear output in one or two
  * tasks while the cluster idles, at any data size (SCALING.md r10,
  * "AQE fan-out blindness"). Three instances were found by hand in rounds
  * 8–10, each behind a scaladoc that wrongly claimed "AQE handles it";
  * this walker finds the SHAPE everywhere instead.
  *
  * What it flags, per declared query, on the OPTIMIZED logical plan:
  *
  *  - **M:N equi-joins** — inner/outer equi-joins where NEITHER side can
  *    be certified unique on its join keys. Output per key is
  *    m_k·n_k — superlinear in one key's input, invisible to AQE (both
  *    the SMJ single-key concentration and the BHJ map-side fan-out over
  *    AQE-coalesced upstream partitions, `DedupOps.expandRepPairs`'
  *    "coalesced-width blindness" note). Uniqueness is PROVED
  *    structurally: a side is unique on its keys iff the keys cover a
  *    grouping set (Aggregate), a dedup key set (Deduplicate), a base
  *    table's primary key (the fixture PKs below), a Range id, a
  *    ≤1-row LocalRelation, or a row-preserving/reducing chain
  *    (Project/Filter/Sort/Limit/Sample/Window/repartition) over one of
  *    those; semi/anti joins preserve the left side's certificate;
  *    inner/outer equi-joins preserve a side's certificate when the
  *    OTHER side is itself unique on its keys (an FK→dim chain stays
  *    1:1). Everything else — including LogicalRDD checkpoint leaves,
  *    whose upstream uniqueness the plan no longer shows — is
  *    conservatively non-unique.
  *  - **non-equi joins** (pure range/interval/theta conditions, cross
  *    joins): output can be superlinear in ANY hot value region, the
  *    q45/q79 family. Flagged unless a side is 1-row-bounded.
  *  - **explode-over-join** — a Generate whose subtree contains a Join:
  *    the explode multiplies ALREADY-JOINED rows, so its output is
  *    join-output × per-row array size (the q70-within
  *    explode(sequence(0,63)) shape).
  *
  * Every hit must be allowlisted in ScaleLintSpec's `boundedFanout` with
  * a NAMED bound ("order-size-bounded", "band-width-bounded", "adaptive
  * skew dispatch", …) — the same contract as the other eight classes.
  * The empirical seeding for the bounds lives in SCALING.md r11 (zipf +
  * hub fixtures, per-task max-time ≪ wall).
  *
  * KNOWN LIMIT, by design: eager iterative operators (connected
  * components, k-core, PageRank) run their joins at BUILD time behind
  * localCheckpoint leaves, so this walker never sees them — those are
  * exactly the class-#8 `boundedEagerAction` entries, each of which
  * names its loop bound; the two allowlists are complementary.
  */
object FanoutAudit {

  /** Fixture-table primary keys, recognized at scan leaves by file path.
    * A scan side joined ON its full PK emits ≤1 row per key — the FK→PK
    * join certificate that keeps the suite's hundreds of dimension joins
    * out of the report. */
  private val tablePk: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"), "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"), "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"), "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "documents" -> Seq("doc_id"), "embeddings" -> Seq("vec_id"),
    "events" -> Seq("event_id"))

  /** Is `p` certified to emit at most one row per distinct value of
    * `keys` (attributes of `p.output`)? False = "could not prove", not
    * "proved non-unique". */
  private[graft] def uniqueOn(p: LogicalPlan, keys: AttributeSet): Boolean = p match {
    case _ if maxOneRow(p) => true
    case Project(projList, child) =>
      // rewrite keys through aliases down to child attributes; a key
      // computed from a non-attribute expression can't be traced
      val mapped = keys.toSeq.map { k =>
        projList.find(_.exprId == k.exprId) match {
          case Some(a: AttributeReference) => Some(a)
          case Some(Alias(a: AttributeReference, _)) => Some(a)
          case Some(Alias(Cast(a: AttributeReference, _, _, _), _)) => Some(a)
          case _ => None
        }
      }
      mapped.forall(_.isDefined) &&
        uniqueOn(child, AttributeSet(mapped.flatten))
    case Filter(_, child) => uniqueOn(child, keys)
    case Sort(_, _, child, _) => uniqueOn(child, keys)
    case GlobalLimit(_, child) => uniqueOn(child, keys)
    case LocalLimit(_, child) => uniqueOn(child, keys)
    case Sample(_, _, _, _, child) => uniqueOn(child, keys)
    case Window(_, _, _, child, _) =>
      uniqueOn(child, keys.filter(child.outputSet.contains))
    case r: RepartitionOperation => uniqueOn(r.child, keys)
    case r: RebalancePartitions => uniqueOn(r.child, keys)
    case a: Aggregate =>
      // output is unique on the grouping outputs: certified iff EVERY
      // grouping expression surfaces as an output attribute inside keys
      a.groupingExpressions.isEmpty ||
        a.groupingExpressions.forall { g =>
          a.aggregateExpressions.exists {
            case at: Attribute => g.semanticEquals(at) && keys.contains(at)
            case al @ Alias(c, _) => g.semanticEquals(c) && keys.contains(al.toAttribute)
            case _ => false
          }
        }
    case d: Deduplicate => AttributeSet(d.keys).subsetOf(keys)
    case Distinct(child) => child.outputSet.subsetOf(keys)
    case j: Join => j.joinType match {
      case LeftSemi | LeftAnti => uniqueOn(j.left, keys)
      case Inner | Cross | LeftOuter | RightOuter | FullOuter | _: ExistenceJoin =>
        // a join preserves a side's uniqueness certificate iff the other
        // side matches ≤1 row per row of ours: either ≤1 row TOTAL (the
        // crossJoin(broadcast(scalarTotals)) idiom) or unique on ITS
        // equi keys (the FK→dim chain). Keys must come entirely from
        // one side.
        val (lk, rk) = equiKeys(j)
        def chains(ours: LogicalPlan, theirs: LogicalPlan,
            theirKeys: Seq[Expression]): Boolean =
          uniqueOn(ours, keys) && (maxOneRow(theirs) ||
            (theirKeys.nonEmpty && attrsOf(theirKeys).exists(a =>
              a.nonEmpty && uniqueOn(theirs, AttributeSet(a)))))
        if (keys.subsetOf(j.left.outputSet)) chains(j.left, j.right, rk)
        else if (keys.subsetOf(j.right.outputSet)) chains(j.right, j.left, lk)
        else false
      case _ => false
    }
    case r: Range => keys.exists(k => r.output.exists(_.exprId == k.exprId))
    case l: LocalRelation => l.data.lengthCompare(1) <= 0
    case l: LogicalRelation =>
      scanTable(l).exists { t =>
        tablePk(t).forall(pk =>
          l.output.exists(a => a.name == pk && keys.contains(a)))
      }
    case _ => false
  }

  /** ≤1-row frames are unique on anything (scalar aggregates, limit 1). */
  private def maxOneRow(p: LogicalPlan): Boolean = p match {
    case _: OneRowRelation => true
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case l: LocalRelation => l.data.lengthCompare(1) <= 0
    case GlobalLimit(IntegerLiteral(n), _) if n <= 1 => true
    case Project(_, c) => maxOneRow(c)
    case Filter(_, c) => maxOneRow(c)
    case Sort(_, _, c, _) => maxOneRow(c)
    case _ => false
  }

  private def attrsOf(es: Seq[Expression]): Option[Seq[Attribute]] = {
    val as = es.map {
      case a: Attribute => Some(a)
      case Cast(a: Attribute, _, _, _) => Some(a)
      case _ => None
    }
    if (as.forall(_.isDefined)) Some(as.flatten) else None
  }

  private def scanTable(l: LogicalRelation): Option[String] =
    l.relation match {
      case h: HadoopFsRelation =>
        val p = h.location.rootPaths.map(_.toString).mkString(",")
        tablePk.keys.find(t => p.contains(s"$t.parquet"))
      case _ => None
    }

  /** Conjunct split + equi-key extraction from a join condition:
    * EqualTo/EqualNullSafe conjuncts with one side referencing only the
    * left plan and the other only the right. */
  private[graft] def equiKeys(j: Join): (Seq[Expression], Seq[Expression]) = {
    val conj = j.condition.toSeq.flatMap(splitConjunctivePredicates)
    conj.flatMap {
      case EqualTo(l, r) => orient(j, l, r)
      case EqualNullSafe(l, r) => orient(j, l, r)
      case _ => None
    }.unzip
  }
  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case x => Seq(x)
    }
  private def orient(j: Join, l: Expression, r: Expression):
      Option[(Expression, Expression)] =
    if (l.references.subsetOf(j.left.outputSet) &&
        r.references.subsetOf(j.right.outputSet)) Some((l, r))
    else if (r.references.subsetOf(j.left.outputSet) &&
        l.references.subsetOf(j.right.outputSet)) Some((r, l))
    else None

  /** One line per flagged site; empty = the plan carries no
    * fan-out-capable shape this walker can see. */
  def audit(plan: LogicalPlan): Seq[String] = {
    val joins = plan.collect { case j: Join => j }.flatMap { j =>
      j.joinType match {
        case LeftSemi | LeftAnti => Nil // ≤1 output row per left row
        case _ =>
          val (lk, rk) = equiKeys(j)
          if (lk.isEmpty) {
            if (maxOneRow(j.left) || maxOneRow(j.right)) Nil
            else Seq(s"non-equi ${j.joinType} join" +
              j.condition.map(c => s" on ${c.sql.take(80)}").getOrElse(" (cross)"))
          } else {
            val lu = attrsOf(lk).exists(a =>
              uniqueOn(j.left, AttributeSet(a)))
            val ru = attrsOf(rk).exists(a =>
              uniqueOn(j.right, AttributeSet(a)))
            if (lu || ru) Nil
            else Seq(s"M:N ${j.joinType} join on " +
              lk.zip(rk).map { case (a, b) => s"${a.sql}=${b.sql}" }
                .mkString(", ").take(100))
          }
      }
    }
    val explodes = plan.collect {
      case g: Generate if g.child.exists(_.isInstanceOf[Join]) =>
        s"explode over join: ${g.generator.sql.take(80)}"
    }
    (joins ++ explodes).distinct
  }
}
