package graft

import java.nio.file.Files

import graft.sparkify.Pipelines
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.Random

/** Property-style tests (seeded generators — the offline environment has
  * no scalatest-scalacheck bridge): calendar-field round-trips vs
  * java.time, dedup idempotence, partitioned write/read equality, and
  * exact-decimal aggregation vs BigDecimal ground truth.
  */
class PropertySpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private val rnd = new Random(42)

  test("time table calendar fields agree with java.time for random epochs") {
    // epoch millis across 2015-2030, including day boundaries
    val tss = Seq.fill(300)(1420070400000L + (rnd.nextDouble() * 4.7e11).toLong)
    val rows = tss.map(ts => Row(null, null, null, null, null, null, null,
      null, null, null, "Home", null, null, null, null, ts, null, "u"))
    val logs = spark.createDataFrame(rows.asJava, sparkify.Schemas.logData)
    val got = Pipelines.timeTable(logs).collect()
      .map(r => r.getLong(0) -> r).toMap
    tss.distinct.foreach { ts =>
      val t = java.time.Instant.ofEpochMilli(ts).atZone(java.time.ZoneOffset.UTC)
      val r = got(ts)
      assert(r.getInt(1) == t.getHour, s"hour for $ts")
      assert(r.getInt(2) == t.getDayOfMonth, s"day for $ts")
      assert(r.getInt(3) == t.get(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear()), s"week for $ts")
      assert(r.getInt(4) == t.getMonthValue, s"month for $ts")
      assert(r.getInt(5) == t.getYear, s"year for $ts")
      assert(r.getInt(6) == t.getDayOfWeek.getValue, s"weekday for $ts") // Monday=1
    }
  }

  test("tie-keeping top-k modes equal the window rank filters on random data") {
    import spark.implicits._
    // heavy ties by construction: ord drawn from only 6 values over 40
    // keys × ~30 rows, so boundary ties occur in almost every group
    val rows = Seq.fill(1200)(
      (rnd.nextInt(40).toLong, rnd.nextInt(6).toLong, rnd.nextLong()))
    val df = rows.toDF("key", "ord", "id").repartition(9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("ord").desc)
    for (k <- Seq(1, 2, 3)) {
      val wantRank = df.withColumn("r", rank().over(w))
        .filter(col("r") <= k).select("key", "ord", "id")
      val gotRank = plans.TopKPerKey.perKey(df, Seq("key"),
        Seq("ord" -> true), k, plans.TopKPerKey.RankTies)
        .select("key", "ord", "id")
      assert(gotRank.exceptAll(wantRank).isEmpty
        && wantRank.exceptAll(gotRank).isEmpty, s"rank k=$k diverged")
      val wantDense = df.withColumn("r", dense_rank().over(w))
        .filter(col("r") <= k).select("key", "ord", "id")
      val gotDense = plans.TopKPerKey.perKey(df, Seq("key"),
        Seq("ord" -> true), k, plans.TopKPerKey.DenseTies)
        .select("key", "ord", "id")
      assert(gotDense.exceptAll(wantDense).isEmpty
        && wantDense.exceptAll(gotDense).isEmpty, s"dense k=$k diverged")
    }
  }

  test("streaming CDC upsert equals the batch fold on random change feeds") {
    import spark.implicits._
    // random feed over 12 keys with out-of-order/stale sequence numbers
    // and random deletes, delivered as 4 files; (k, seq) is unique — a
    // replication log never assigns one offset twice, and an in-trigger
    // seq tie would be a nondeterministic apply order by construction
    val changes = Seq.fill(120) {
      (rnd.nextInt(12).toLong, rnd.nextInt(40).toLong,
        Seq("I", "U", "D")(rnd.nextInt(3)),
        "p" + rnd.nextInt(100))
    }.groupBy(c => (c._1, c._2)).map(_._2.head).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("supsert_prop").toString
    val src = s"$tmp/src"
    changes.grouped((changes.size + 3) / 4).foreach { rows =>
      rows.toDF("k", "seq", "op", "payload").coalesce(1)
        .write.mode("append").parquet(src)
      Thread.sleep(5)
    }
    val emitted = streaming.StreamingOps.runToMemory(spark,
      streaming.StreamingOps.upsertStream(spark, src), "upsert_prop", "update")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) null else r.getString(3)))
    val view = emitted.groupBy(_._1).map { case (_, es) => es.maxBy(_._2) }
      .filterNot(_._3).map(e => e._1 -> e._4).toMap
    // batch fold: the max-seq change wins outright (seqs unique per key)
    val ref = changes.groupBy(_._1).flatMap { case (k, cs) =>
      val last = cs.maxBy(_._2)
      if (last._3 == "D") None else Some(k -> last._4)
    }
    assert(view == ref, s"view=$view ref=$ref")
  }

  test("distinct is idempotent and order-insensitive") {
    import spark.implicits._
    val xs = Seq.fill(500)(rnd.nextInt(50)).toDF("x")
    val once = xs.distinct()
    assert(once.distinct().count() == once.count())
    val shuffled = xs.repartition(7).distinct()
    assert(shuffled.collect().map(_.getInt(0)).sorted.toSeq ==
      once.collect().map(_.getInt(0)).sorted.toSeq)
  }

  test("partitioned write then read returns exactly the input rows") {
    import spark.implicits._
    val df = Seq.tabulate(200)(i =>
      (i.toLong, 2018 + rnd.nextInt(3), 1 + rnd.nextInt(12), rnd.nextDouble()))
      .toDF("id", "year", "month", "v")
    val dir = Files.createTempDirectory("pw").toFile.getAbsolutePath
    Pipelines.writePartitioned(df, s"$dir/t", Seq("year", "month"))
    val back = spark.read.parquet(s"$dir/t")
      .select("id", "year", "month", "v")
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("Exact.dsum matches BigDecimal ground truth at any partitioning") {
    import spark.implicits._
    val vals = Seq.fill(2000)(BigDecimal(rnd.nextInt(20000000)) / 100)
    val want = vals.sum.toDouble
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.map(_.toDouble).toDF("x").repartition(parts)
        .agg(functions.Exact.dsum(col("x")).as("s"))
        .head().getDouble(0)
      assert(got == want, s"parts=$parts")
    }
  }

  test("Exact.cents/lsum fast path is bit-identical to the decimal path") {
    // the per-row floor(x*100+0.5) rounding must agree with the decimal
    // HALF_UP cast on every real data row (q01's oracle depends on it)
    val li = Tables.lineitem(spark, sfDir)
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")) {
      val mism = li.filter(
        functions.Exact.cents(col(c)) =!=
          (col(c).cast(DecimalType(18, 2)) * 100).cast("long")).count()
      assert(mism == 0L, s"cents($c) diverges from decimal cast on $mism rows")
    }
    val got = li.agg(
      functions.Exact.lsum(functions.Exact.cents(col("l_extendedprice")), 2).as("l"),
      functions.Exact.dsum(col("l_extendedprice")).as("d")).head()
    assert(got.getDouble(0) == got.getDouble(1))
  }

  test("Exact.lsum split recombination is exact for signed longs") {
    import spark.implicits._
    val xs = Seq.fill(2000)(rnd.nextLong() % 1000000000L) // mixed signs
    val want = xs.sum.toDouble // |Σ| < 2^53, exactly representable
    for (parts <- Seq(1, 7, 32)) {
      val got = xs.toDF("x").repartition(parts)
        .agg(functions.Exact.lsum(col("x"), 0).as("s")).head().getDouble(0)
      assert(got == want, s"parts=$parts")
    }
  }

  test("Exact.lsumDec is exact at moment-column magnitudes past the 2-chunk bound") {
    import spark.implicits._
    // squared-cents moments at 100 TB: ~1e14 per row, Σ past 9.7e24 — the
    // regime where a 2^20 hi/lo split silently overflows its hi half. The
    // 21-bit 3-chunk split's bound is row-count-only (n < 2^42), so these
    // sums must match BigInt ground truth exactly.
    val magnitudes = Seq(1L << 46, (1L << 61) + 12345L, -(1L << 60), 99999999999999L)
    for (m <- magnitudes) {
      val xs = Seq.fill(3000)(
        (m + rnd.nextInt(1 << 20)) * (if (rnd.nextBoolean()) 1L else -1L))
      val want = xs.foldLeft(BigInt(0))(_ + _)
      val got = xs.toDF("x").repartition(13)
        .agg(functions.Exact.lsumDec(col("x")).as("s"))
        .head().getDecimal(0)
      assert(BigInt(got.toBigInteger) == want, s"magnitude=$m")
    }
  }

  test("Md5Long60 equals the conv(substr(md5)) built-in chain on real text") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("text"), explode(functions.TextFns.tokens(col("text"))).as("tok"))
    def oldHash(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val mism = docs.filter(
      functions.TextFns.hash60(col("tok")) =!= oldHash(col("tok")) ||
        functions.TextFns.hash60Seeded(3, col("tok")) =!=
          oldHash(concat(lit("3:"), col("tok"))) ||
        functions.TextFns.hash60(col("text")) =!= oldHash(col("text"))).count()
    assert(mism == 0L)
  }

  test("Tables.widen repartitions narrow inputs and passes wide ones through") {
    import spark.implicits._
    // local[4] => defaultParallelism 4: a 1-partition input must widen...
    val narrow = spark.range(0, 100, 1, 1).toDF("doc_id")
    // a repartition is inserted (AQE may still coalesce tiny test data)
    val widened = Tables.widen(narrow, col("doc_id"))
    assert(widened ne narrow)
    assert(widened.queryExecution.logical.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
    }.nonEmpty)
    // ...and an already-wide input must come back untouched (same plan, no
    // gratuitous Exchange at cluster scale)
    val wide = spark.range(0, 100, 1, 8).toDF("doc_id")
    assert(Tables.widen(wide, col("doc_id")) eq wide)
  }

  test("salted join equals plain join") {
    val e = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    val dim = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    val plain = e.join(dim, Seq("user_id"))
    val salted = operators.Skew.saltedJoin(e, dim, "user_id", 8)
      .select(plain.columns.map(col).toIndexedSeq: _*)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join is salt-count invariant (pinned 3, pinned 8, parallelism default)") {
    // replication meets every match exactly once regardless of n, so the
    // declared q94 (pinned 8 for a stable oracle plan) and a production
    // call on the parallelism-sized default must agree row-for-row
    val e = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    val dim = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    val at8 = operators.Skew.saltedJoin(e, dim, "user_id", 8)
    val at3 = operators.Skew.saltedJoin(e, dim, "user_id", 3)
      .select(at8.columns.map(col).toIndexedSeq: _*)
    val auto = operators.Skew.saltedJoin(e, dim, "user_id")
      .select(at8.columns.map(col).toIndexedSeq: _*)
    assert(at3.exceptAll(at8).isEmpty && at8.exceptAll(at3).isEmpty)
    assert(auto.exceptAll(at8).isEmpty && at8.exceptAll(auto).isEmpty)
  }

  test("stateful streaming running counts end at the batch totals") {
    val stream = streaming.StreamingOps.eventsStream(spark, sfDir)
    val got = streaming.StreamingOps.runToMemory(spark,
      streaming.StreamingOps.runningUserCounts(spark, stream), "running_counts")
    // last update per user == total events for that user
    val finalCounts = got.groupBy("user_id").agg(max("n_events").as("n_events"))
    val want = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    assert(finalCounts.exceptAll(want).isEmpty && want.exceptAll(finalCounts).isEmpty)
  }
}
