package graft

import graft.functions.{TextFns, VectorExprs}
import graft.operators._
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic properties of the round-5 fourth batch: RRF hybrid retrieval,
  * semantic decontamination, drift timeline, grouped heavy hitters, and
  * multimodal frame dedup. Cross-engine value equality is covered by the
  * DuckDB gate; these pin the semantics a hash compare wouldn't explain.
  */
class HybridRetrievalSpec extends SparkTestBase {
  import spark.implicits._

  test("q111: rrf scores recompute exactly from the component ranks; order is (score, id)") {
    val rows = SimilarityOps.q111RrfHybrid(spark, sfDir)
      .orderBy(col("final_rank")).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getLong(4)).toSeq == (1L to rows.length).toSeq)
    def term(r: Row, i: Int): Double =
      if (r.isNullAt(i)) 0.0 else 1.0 / (60L + r.getLong(i))
    // the two-term fixed-order sum must reproduce the stored score bit-for-bit
    rows.foreach { r =>
      assert(r.getDouble(3) == term(r, 1) + term(r, 2), r.toString)
    }
    val key = rows.map(r => (-r.getDouble(3), r.getLong(0))).toSeq
    assert(key == key.sorted, "fused list not ordered by (rrf desc, doc_id)")
    // fusion is a union: at least one doc must come from a single list
    // (the lexical and dense top-20s are never identical on this corpus)
    assert(rows.exists(r => r.isNullAt(1) || r.isNullAt(2)))
  }

  test("q112: flagged set matches the brute-force bipartite scan restricted to band candidates") {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("q"))
      .withColumn("n2", VectorExprs.quantized_norm2(col("q")))
    val isEval = pmod(TextFns.hash60(
      concat(lit("eval:"), col("vec_id").cast("string"))), lit(100)) < 5
    val ev = base.filter(isEval).select(col("vec_id").as("eval_id"),
      col("q").as("qe"), col("n2").as("ne2"))
    val brute = base.filter(!isEval).crossJoin(ev)
      .withColumn("cos", VectorExprs.quantized_dot(col("q"), col("qe"))
        .cast("double") / sqrt((col("n2") * col("ne2")).cast("double")))
      .filter(col("cos") >= 0.4)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_b"), max(col("cos")).as("max_b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val got = SimilarityOps.q112SemanticDecontam(spark, sfDir).collect()
    got.foreach { r =>
      val (nB, maxB) = brute(r.getLong(0)) // flagged ⇒ brute-force flags it too
      assert(r.getLong(1) <= nB, "band candidates exceed brute-force matches")
      assert(r.getDouble(2) <= maxB && r.getDouble(2) >= 0.4)
    }
  }

  test("q121: hard negatives exclude the query's label and rank by cosine") {
    val labels = Tables.embeddings(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val got = SimilarityOps.q121HardNegatives(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (qId, negId, negLabel, _, _) =>
      assert(labels(negId) == negLabel && negLabel != labels(qId))
    }
    got.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._5)
      assert(byRank.map(_._5).toSeq == (1L to byRank.length).toSeq)
      val cs = byRank.map(_._4)
      cs.zip(cs.drop(1)).foreach { case (a, b) => assert(a >= b) }
    }
  }

  test("q113: marginal totals are consistent and chi terms recompute exactly") {
    val rows = EventOps.q113DriftTimeline(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nAll = rows.map(_.getLong(2)).sum
    val byDay = rows.groupBy(_.getDate(0).toString)
    val byType = rows.groupBy(_.getString(1))
    byDay.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sum == rs.head.getLong(3)) // Σ_type c = n_day
    }
    byType.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sum == rs.head.getLong(4)) // Σ_day c = n_type
    }
    rows.foreach { r =>
      val (c, nd, nt) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val dev = (c * nAll - nd * nt).toDouble
      assert(r.getDouble(5) == dev * dev / (nAll * nd * nt).toDouble)
    }
  }

  test("q114: equals the per-lang row_number window reference") {
    val counts = Tables.documents(spark, sfDir)
      .select(col("lang"),
        filter(TextFns.tokens(col("text")), t => t =!= "").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("lang"), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat(element_at(col("toks"), i), lit(" "),
          element_at(col("toks"), i + 1)))).as("bg"))
      .groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("lang")).orderBy(col("c").desc, col("bg").asc)
    val ref = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got = TextOps.q114LangTopBigrams(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == ref)
    assert(got.groupBy(_._1).values.forall(_.size <= 5))
  }

  test("qm3: known shared frames pair up; a boilerplate frame past the df cap contributes nothing") {
    def blk(c: Char) = c.toString * 32
    def blkS(s: String) = (s * 32).take(32)
    // 9 blocks of 32 bytes → sampleFrames (32-byte frames, every 4th)
    // picks block positions 0, 4, 8
    // doc 1 and 2: identical 9-block media → all three sampled frames shared
    val shared = "abcdefghi".map(blk).mkString
    // doc 3 shares only the pos-0 frame with 1/2 → below minShared
    val d3 = blk('a') + "jklmnopq".map(blk).mkString
    // docs 10..40: a hot pos-0 frame ('z', df=31 > cap); docs 10,11
    // additionally share their pos-4 and pos-8 frames — only those two
    // may count toward the pair
    def hot(id: Long, mid: String, last: String) =
      (id, blk('z') + blk('f') * 3 + blkS(mid) + blk('f') * 3 + blkS(last), "s")
    val docs = Seq((1L, shared, "s"), (2L, shared, "s"), (3L, d3, "s")) ++
      (10L to 40L).map { i =>
        if (i <= 11L) hot(i, "my", "lw") else hot(i, s"m$i", s"l$i")
      }
    val media = multimodal.Multimodal.asMediaTable(
      docs.toDF("doc_id", "text", "source"))
    val got = multimodal.Multimodal.frameDedupPairs(spark, media)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 3L)
    assert(got.contains((10L, 11L)) && got((10L, 11L)) == 2L,
      s"hot frame must not count toward (10,11): $got")
    assert(got.keySet == Set((1L, 2L), (10L, 11L)), got.toString)
  }
}
