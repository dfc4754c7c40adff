package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Semantic properties of the round-5 third batch: BM25 retrieval, CDC
  * merge, 2-D skyline, per-group robust outliers. Cross-engine value
  * equality is covered by the DuckDB gate; these pin the semantics a
  * hash compare wouldn't explain.
  */
class RetrievalMergeSpec extends SparkTestBase {
  import spark.implicits._

  private def toksDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))

  test("bm25: rarer term outscores common term at equal tf and dl") {
    // 'rare' appears in 1 of 4 docs, 'common' in all 4 — idf must order
    // the two single-hit docs, everything else equal
    val docs = toksDf(
      (1L, "rare aaa bbb"),
      (2L, "common aaa bbb"),
      (3L, "common ccc ddd"),
      (4L, "common eee fff"))
    val got = TextOps.bm25(docs, Seq("rare", "common"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(got(1L) > got(2L))
  }

  test("bm25: length normalization — same tf, shorter doc wins") {
    val docs = toksDf(
      (1L, "hit aaa"),
      (2L, "hit aaa bbb ccc ddd eee fff ggg"))
    val got = TextOps.bm25(docs, Seq("hit"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(got(1L) > got(2L))
  }

  test("bm25: absent terms contribute exactly zero; no-hit docs dropped") {
    val docs = toksDf((1L, "hit aaa"), (2L, "miss bbb"))
    val rows = TextOps.bm25(docs, Seq("hit", "nothere"), k = 10).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
    // tf_1 = 0 for the surviving doc: term absent from the whole corpus
    assert(rows.head.getLong(3) == 0L)
    assert(rows.head.getDouble(4) > 0d)
  }

  test("cdc merge: deletes gone, updates applied, inserts present, rest untouched") {
    val merged = MiscOps.q105CdcMerge(spark, sfDir)
    val base = Tables.customer(spark, sfDir)
    val byKey = merged.collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getDouble(3)))).toMap
    val baseRows = base.collect()
      .map(r => (r.getLong(0), r.getString(4), r.getDouble(3)))
    baseRows.foreach { case (k, seg, bal) =>
      (k % 50) match {
        case 0 => assert(!byKey.contains(k)) // deleted
        case 1 => // updated in place
          assert(byKey(k) == (("UPDATED", bal + 100.0)))
        case 2 => // original kept AND insert landed under the new key
          assert(byKey(k) == ((seg, bal)))
          assert(byKey(k + 1000000L) == (("NEW", bal)))
        case _ => assert(byKey(k) == ((seg, bal)))
      }
    }
    val nDel = baseRows.count(_._1 % 50 == 0)
    val nIns = baseRows.count(_._1 % 50 == 2)
    assert(merged.count() == baseRows.length - nDel + nIns)
  }

  test("skyline: dominance with ties — equal points both survive") {
    val pts = Seq(
      (1L, 1.0, 5), // dominated by (2): same price, bigger size
      (2L, 1.0, 7), // frontier
      (3L, 2.0, 7), // dominated by (2): strictly cheaper, size >=
      (4L, 2.0, 3), // dominated
      (5L, 3.0, 8), // frontier (tie with 6 — neither strictly dominates)
      (6L, 3.0, 8)) // frontier
      .toDF("p_partkey", "p_retailprice", "p_size")
    val got = StatsOps.paretoFrontier(pts).collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 5L, 6L))
  }

  test("skyline: agrees with quadratic dominance check on random points") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 300L).map(i =>
      (i, (rnd.nextInt(40) + 1).toDouble, rnd.nextInt(40) + 1))
    val expected = pts.filter { case (_, pr, sz) =>
      !pts.exists { case (_, qr, qz) =>
        (qr < pr && qz >= sz) || (qr <= pr && qz > sz)
      }
    }.map(_._1).toSet
    val got = StatsOps.paretoFrontier(
      pts.toDF("p_partkey", "p_retailprice", "p_size"))
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("chi-square drift: identical sides score exactly zero") {
    // same bucket histogram on both sides → every deviation term is 0
    val frame = (for { b <- 0L to 3L; s <- 0 to 1; _ <- 1 to 5 } yield (b, s))
      .toDF("bucket", "side")
    val got = CurationOps.chiSquareBuckets(frame).collect()
    assert(got.length == 4)
    got.foreach(r => assert(r.getAs[Double]("chi_term") == 0.0))
  }

  test("chi-square drift: a shifted bucket carries positive mass") {
    // ref all in bucket 0, cur all in bucket 1 — max drift, both terms > 0
    val frame = ((1L to 10L).map(_ => (0L, 0)) ++ (1L to 10L).map(_ => (1L, 1)))
      .toDF("bucket", "side")
    val got = CurationOps.chiSquareBuckets(frame).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("chi_term")).toMap
    assert(got(0L) > 0.0 && got(1L) > 0.0)
    // the full statistic for a perfect 2x2 split is n (=20)
    assert(math.abs(got(0L) + got(1L) - 20.0) < 1e-9)
  }

  test("incremental agg: merged state equals direct recompute") {
    val merged = MiscOps.q109IncrementalAgg(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val direct = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        (sum(graft.functions.Exact.cents(col("o_totalprice")))
          .cast("double") / 100.0d).as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(merged == direct)
  }

  test("pps sample: matches a local prefix-sum reference, skips zero weights") {
    val n = 500
    val rnd = new scala.util.Random(11)
    val w = (1L to n).map(i => i -> (if (i % 7 == 0) 0L else rnd.nextInt(40) + 1L))
    val got = CurationOps.ppsSample(w.toDF("doc_id", "n_tokens"), k = 20)
      .collect().map(_.getLong(0)).toSet
    // local reference: same integer crossing rule
    val total = w.map(_._2).sum
    val step = math.max(1L, total / 20)
    var cum = 0L
    val expected = w.flatMap { case (id, wt) =>
      val before = cum; cum += wt
      if (before / step < cum / step) Some(id) else None
    }.toSet
    assert(got == expected)
    assert(got.intersect(w.filter(_._2 == 0L).map(_._1).toSet).isEmpty)
    assert(got.size >= 19 && got.size <= 21) // ~k picks
  }

  test("robust outliers: flags the far point, ignores tight groups") {
    val parts = (
      (1L to 10L).map(i => (i, "A", 10.0)) ++     // tight cluster at 10
        Seq((11L, "A", 100.0)) ++                 // the outlier
        (20L to 29L).map(i => (i, "B", 50.0))     // constant group: MAD 0
      ).toDF("p_partkey", "p_brand", "p_retailprice")
    val got = StatsOps.robustOutliers(parts).collect()
    assert(got.map(_.getLong(0)).toSet == Set(11L))
    val r = got.head
    assert(r.getDouble(3) == 10.0) // median of brand A
  }
}
