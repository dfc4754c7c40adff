package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Isolated A/B attribution harness — the q111 lesson turned into a
  * tool: a query's SUITE-position time carries ~1.7 s of GC/codegen
  * context (SCALING.md r8), so a bench-to-bench mover must be
  * adjudicated by an ISOLATED interleaved A/B of the two variants, not
  * by bisecting suite runs. Runs each registered variant once to warm
  * (codegen/JIT), then `passes` interleaved measured passes, and prints
  * median + min per variant (min ≈ the noise floor on a co-tenant box).
  *
  * Usage: runMain graft.PerfAB [sfDir] [passes] [variantCsv]
  * (defaults /root/testdata/sf0.1, 5, all registered variants).
  */
object PerfAB {

  /** Variant registry: A/B pairs live here so the attribution that
    * cleared (or convicted) a mover is re-runnable verbatim. */
  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    // r9: attribute q52's +27% r8 move (1.62 -> 2.06 s) — the round's
    // only co-located change was the full-probe-set certified mean
    "q52_full_probe_mean" ->
      ((s, d) => operators.SimilarityOps.q52KnnIvfImpl(s, d, fullProbeMean = true)),
    "q52_r7_found_mean" ->
      ((s, d) => operators.SimilarityOps.q52KnnIvfImpl(s, d, fullProbeMean = false)),
    // r10: price the collapse's 1x overhead (q35/q37 regressed x1.58 /
    // x1.39 in r9 on the nothing-to-collapse bench corpus) and the
    // internal fingerprint choice — the declared form rides the
    // two-seed xxhash64 pair since r10; md5 is the A/B baseline
    "q35_collapse_md5" -> ((s, d) => operators.DedupOps.q35Md5(s, d)),
    "q35_collapse_xxh" -> ((s, d) => operators.DedupOps.q35NgramJaccard(s, d)),
    "q35_identity_nocollapse" -> ((s, d) => operators.DedupOps.q35Identity(s, d)),
    "q37_collapse_md5" -> ((s, d) => operators.DedupOps.q37Md5(s, d)),
    "q37_collapse_xxh" -> ((s, d) => operators.DedupOps.q37Simhash(s, d)),
    "q37_identity_nocollapse" -> ((s, d) => operators.DedupOps.q37Identity(s, d)),
    // r10: the q52 declared reshape (exact side + certified boolean)
    // adds a q39 pass on top of the unchanged IVF pipeline
    "q52_declared_r10" -> ((s, d) => operators.SimilarityOps.q52KnnIvf(s, d)),
    // r10: triangle orientation — the adaptive declared form (probes
    // max single-key wedge output, picks id- or degree-ordering), the
    // forced degree branch, and the r1-r10 unconditional id form, on
    // the real q36 graph and on synthetic hubs (star + ring with the
    // hub id in the middle: id-ordering parks (n/2)² wedges on the
    // hub's single join key). sfDir is ignored by the hub pairs.
    "q83_adaptive" -> ((s, d) => operators.DedupOps.q83Triangles(s, d)),
    // r12: the pre-blow-up-dispatch declared shape (no rep-pair
    // checkpoint, no blow-up-mass probe) — prices the dispatch's 1×
    // insurance premium on a normal corpus
    "q83_enum_r11" -> ((s, d) =>
      operators.DedupOps.triangles(operators.DedupOps.q36MinhashLsh(s, d))),
    // r12 CC restructure A/B: the r11 declared q64 shape (star + rep
    // edges inside the iterative loop) vs the rep-graph loop with
    // post-loop star attachment (the declared form since r12). Both
    // run the same fused-init CC, so the pair isolates the edge-set
    // restructure itself.
    "q64_cc_star_r11" -> ((s, d) => operators.DedupOps.connectedComponents(
      operators.DedupOps.ccEdgesMinhash(operators.DedupOps.collapsedDocs(s, d)))),
    "q64_cc_rep_r12" -> ((s, d) => operators.DedupOps.q64DedupClusters(s, d)),
    // r12: price the collapse candidate-input CPU-width spread
    "q35_no_spread" -> ((s, d) => operators.DedupOps.q35NoSpread(s, d)),
    "q35_spread" -> ((s, d) => operators.DedupOps.q35NgramJaccard(s, d)),
    "q37_no_spread" -> ((s, d) => operators.DedupOps.q37NoSpread(s, d)),
    "q37_spread" -> ((s, d) => operators.DedupOps.q37Simhash(s, d)),
    // r12: price the q52 fit-input determinism pin
    "q52_fit_nopin" -> ((s, d) =>
      operators.SimilarityOps.q52KnnIvfImpl(s, d, fullProbeMean = true,
        pinFit = false)),
    "q52_fit_pin" -> ((s, d) =>
      operators.SimilarityOps.q52KnnIvfImpl(s, d, fullProbeMean = true)),
    "q83_deg_forced" -> ((s, d) => operators.DedupOps.trianglesAdaptive(
      operators.DedupOps.q36MinhashLsh(s, d), 1L)),
    "q83_id_oriented" -> ((s, d) =>
      operators.DedupOps.trianglesIdOriented(operators.DedupOps.q36MinhashLsh(s, d))),
    // r10: q70 contamination joined the collapsed family — raw gram
    // join (the r1-r10 form) vs collapse + role-aware expansion
    "q70_raw" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val isBench = pmod(graft.functions.TextFns.hash60(concat(lit("bench:"),
        col("doc_id").cast("string"))), lit(100)) < 5
      operators.CurationOps.contaminationPairs(
        Tables.documents(s, d), Tables.documents(s, d).filter(isBench))
    }),
    "q70_collapsed" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val isBench = pmod(graft.functions.TextFns.hash60(concat(lit("bench:"),
        col("doc_id").cast("string"))), lit(100)) < 5
      operators.CurationOps.contaminationCollapsed(
        Tables.widen(Tables.documents(s, d), col("doc_id"))
          .select(col("doc_id"),
            graft.functions.TextFns.normText(col("text")).as("norm")),
        isBench)
    }),
    // the declared form: one HLL dup-mass probe picks raw or collapsed
    "q70_auto" -> ((s, d) => operators.CurationOps.q70Contamination(s, d)),
    "tri_hub_deg" -> ((s, _) => operators.DedupOps.triangles(hubGraph(s))),
    "tri_hub_id" -> ((s, _) => operators.DedupOps.trianglesIdOriented(hubGraph(s))),
    // the regime the adaptive dispatch exists for: a 40001-node hub
    // parks 4x10^8 wedges on ONE id-ordered join key
    "tri_hub40k_deg" -> ((s, _) => operators.DedupOps.triangles(hubGraph(s, 40001L))),
    "tri_hub40k_id" -> ((s, _) =>
      operators.DedupOps.trianglesIdOriented(hubGraph(s, 40001L))),
    // r11 THRESHOLD-SENSITIVITY rows (VERDICT task 3): the hub-8001
    // graph sits just under IdWedgeThreshold (16M of 16.7M wedges);
    // halving the threshold flips it to the degree branch, doubling
    // keeps the id branch — the pair measures the crossover's flatness
    // (≈ parity expected; the constant's placement is uncritical ±2×)
    "tri_hub_thr_half" -> ((s, _) => operators.DedupOps.trianglesAdaptive(
      hubGraph(s), operators.DedupOps.IdWedgeThreshold / 2)),
    "tri_hub_thr_double" -> ((s, _) => operators.DedupOps.trianglesAdaptive(
      hubGraph(s), operators.DedupOps.IdWedgeThreshold * 2)),
    // same for BoundaryFanThreshold: a synthetic viral boundary of
    // m=5000 head==tail docs probes maxFan = 2.5e7, 1.5x the 2^24 bar —
    // half the threshold salts it, double runs it plain; the 1.5M-doc
    // filler keeps the join naturally in the SMJ regime (the bar's own
    // regime — a broadcastable index with a spread stream has no fat
    // task, see the BoundaryFanThreshold calibration record)
    "ht_viral_thr_half" -> ((s, _) => operators.DedupOps.headTailPairs(
      viralDocs(s), 3, operators.DedupOps.BoundaryFanThreshold / 2)),
    "ht_viral_thr_double" -> ((s, _) => operators.DedupOps.headTailPairs(
      viralDocs(s), 3, operators.DedupOps.BoundaryFanThreshold * 2)),
    // the before/after pair for the r11 boundary salt itself: default
    // threshold salts the m=5000 viral key (2.5e7 pairs spread 64
    // ways); MaxValue forces the r10 single-key plan
    "ht_viral_salted" -> ((s, _) =>
      operators.DedupOps.headTailPairs(viralDocs(s), 3)),
    "ht_viral_plain" -> ((s, _) => operators.DedupOps.headTailPairs(
      viralDocs(s), 3, Long.MaxValue)),
    // r11 q152 window-join salt: run against the bot-user zipf fixture
    // dir (ScaleRegression zipf events, e.g. /tmp/graft_scale/x20000-zipf)
    // — auto dispatches the salt there, plain forces the r10 single-key
    // plan
    "q152_auto" -> ((s, d) =>
      operators.EventOps.q152DecayAttribution(s, d)),
    "q152_plain_forced" -> ((s, d) => operators.EventOps.decayAttribution(
      Tables.events(s, d), Long.MaxValue)),
    // r12 mover-attribution rows (VERDICT task 1): the r11 final-window
    // movers q86/q192/q222/q202 run code UNTOUCHED in r11 (static diff:
    // StatsOps unchanged; the EventOps/SimilarityOps hunks are q152/q112
    // regions only) and q83's path is plan-identical on the bench corpus
    // (the r11 shuffle_hash hint lands only in the anyBig salt branch,
    // which the sf0.1 probe leaves cold) — so the A/B here is the
    // DECLARED form against the in-window CANARY, adjudicating "suite
    // noise vs environment" rather than "old code vs new code".
    "canary_range_sum" -> ((s, _) => {
      import org.apache.spark.sql.functions._
      s.range(0, 4000000L, 1, 8).agg(sum(col("id") % 7).as("s"))
    }),
    // r13 (VERDICT tasks 1/2): widen on/off pairs for the above-band
    // movers (q222 ×1.81 normalized, q34 ×1.57, q48 ×1.42 — all in the
    // widened small-frame family whose 32-core scaling ratios were
    // 0.41–0.63) and for the embedding-family input spread r12 shipped
    // by construction but never proved at bench scale. Controls: q11 /
    // q127 (untouched code) run by declared name in the same window.
    // r13 (VERDICT task 6): the MATERIALIZED shared tokenizer for the
    // multi-consumer text queries — the r12 loader-widen loss inverted
    // by checkpointing the tokenized frame once (conditional on a
    // narrow scan; lazy at cluster width)
    "q103_toks_lazy" -> ((s, d) =>
      operators.TextOps.q103PmiBigramsImpl(s, d, materialize = false)),
    "q103_toks_chk" -> ((s, d) =>
      operators.TextOps.q103PmiBigramsImpl(s, d, materialize = true)),
    "q104_toks_lazy" -> ((s, d) =>
      operators.TextOps.q104Bm25Impl(s, d, materialize = false)),
    "q104_toks_chk" -> ((s, d) =>
      operators.TextOps.q104Bm25Impl(s, d, materialize = true)),
    "q111_toks_lazy" -> ((s, d) =>
      operators.SimilarityOps.q111RrfHybridImpl(s, d, materialize = false)),
    "q111_toks_chk" -> ((s, d) =>
      operators.SimilarityOps.q111RrfHybridImpl(s, d, materialize = true)),
    "q122_toks_lazy" -> ((s, d) =>
      operators.TextOps.q122KneserNeyImpl(s, d, materialize = false)),
    "q122_toks_chk" -> ((s, d) =>
      operators.TextOps.q122KneserNeyImpl(s, d, materialize = true)),
    "q148_toks_lazy" -> ((s, d) =>
      operators.TextOps.q148SkipGramImpl(s, d, materialize = false)),
    "q148_toks_chk" -> ((s, d) =>
      operators.TextOps.q148SkipGramImpl(s, d, materialize = true)),
    // r13: price the q226 candidate-generator spread
    "q226_cand_nospread" -> ((s, d) =>
      operators.Relational.q226NegativeSamplesImpl(s, d, spreadCand = false)),
    "q226_cand_spread" -> ((s, d) =>
      operators.Relational.q226NegativeSamplesImpl(s, d, spreadCand = true)),
    // r13: price the one-pass trade-edge builder (explode) against the
    // r12 two-branch union that re-evaluated the pair subtree per
    // direction
    "q101_edges_union_r12" -> ((s, d) =>
      operators.GraphOps.q101UnionEdgesR12(s, d)),
    "q101_edges_explode" -> ((s, d) =>
      SparkEntry.queries("q101_pagerank")(s, d)),
    // r13: price the verification-stage spread (mid-plan
    // REPARTITION_BY_NUM before array_intersect) in isolation
    "q35_verify_nospread" -> ((s, d) =>
      operators.DedupOps.q35NoVerifySpread(s, d)),
    "q35_verify_spread" -> ((s, d) =>
      operators.DedupOps.q35NgramJaccard(s, d)),
    "q222_widen" -> ((s, d) =>
      operators.SimilarityOps.q222BucketPurityImpl(s, d, widen = true)),
    "q222_nowiden" -> ((s, d) =>
      operators.SimilarityOps.q222BucketPurityImpl(s, d, widen = false)),
    "q34_widen" -> ((s, d) =>
      operators.DedupOps.q34DedupExactImpl(s, d, widen = true)),
    "q34_nowiden" -> ((s, d) =>
      operators.DedupOps.q34DedupExactImpl(s, d, widen = false)),
    "q48_widen" -> ((s, d) =>
      operators.SimilarityOps.q48DimStatsImpl(s, d, widen = true)),
    "q48_nowiden" -> ((s, d) =>
      operators.SimilarityOps.q48DimStatsImpl(s, d, widen = false)),
    "q39_widen" -> ((s, d) =>
      operators.SimilarityOps.q39KnnBruteImpl(s, d, widen = true)),
    "q39_nowiden" -> ((s, d) =>
      operators.SimilarityOps.q39KnnBruteImpl(s, d, widen = false)),
    "q40_widen" -> ((s, d) =>
      operators.SimilarityOps.q40KnnLshImpl(s, d, widen = true)),
    "q40_nowiden" -> ((s, d) =>
      operators.SimilarityOps.q40KnnLshImpl(s, d, widen = false)),
    "q112_widen" -> ((s, d) =>
      operators.SimilarityOps.q112SemanticDecontamImpl(s, d, widen = true)),
    "q112_nowiden" -> ((s, d) =>
      operators.SimilarityOps.q112SemanticDecontamImpl(s, d, widen = false)),
    "q38_widen" -> ((s, d) =>
      operators.DedupOps.q38EmbeddingNearDupImpl(s, d, widen = true)),
    "q38_nowiden" -> ((s, d) =>
      operators.DedupOps.q38EmbeddingNearDupImpl(s, d, widen = false)),
    "q49_widen" -> ((s, d) =>
      operators.DedupOps.q49EmbeddingLshDedupImpl(s, d, widen = true)),
    "q49_nowiden" -> ((s, d) =>
      operators.DedupOps.q49EmbeddingLshDedupImpl(s, d, widen = false)),
    "q93_widen" -> ((s, d) =>
      operators.SimilarityOps.q93KnnInt8Impl(s, d, widen = true)),
    "q93_nowiden" -> ((s, d) =>
      operators.SimilarityOps.q93KnnInt8Impl(s, d, widen = false)),
    "q132_widen" -> ((s, d) =>
      operators.SimilarityOps.q132EmbedCovarianceImpl(s, d, widen = true)),
    "q132_nowiden" -> ((s, d) =>
      operators.SimilarityOps.q132EmbedCovarianceImpl(s, d, widen = false)),
    "q86_declared" -> ((s, d) => operators.StatsOps.q86Profile(s, d)),
    "q192_declared" -> ((s, d) => operators.EventOps.q192AudienceOverlap(s, d)),
    "q222_declared" -> ((s, d) => operators.SimilarityOps.q222BucketPurity(s, d)),
    "q202_declared" -> ((s, d) => operators.Relational.q202RfmSegments(s, d)),
    // JOB-LATENCY canary (r12): 20 eager one-aggregate jobs of 32 tiny
    // tasks run at CONSTRUCTION time — times 20 driver/scheduler job
    // round-trips with negligible compute, the component a KMeans-style
    // iterative query (q52: ~dozens of tiny jobs) or a many-stage small
    // union (q86) is exposed to and a one-fat-stage query is not. The
    // compute canary (canary_range_sum) and this pair decompose a
    // window's slowness into "cores are slow" vs "job round-trips are
    // slow" — the r11 final-window movers were all in the second class.
    "job_latency_x20" -> ((s, _) => {
      import org.apache.spark.sql.functions._
      (1 to 20).foreach { _ =>
        s.range(0, 32L, 1, 32).agg(count(lit(1))).head()
      }
      s.range(0, 1L).select(col("id"))
    }))

  /** 5000 copies of one 3-token doc (head window == tail window, ONE
    * boundary hash carrying 2.5·10⁷ pair outputs, 1.5× the 2²⁴ bar)
    * over a 1.5M-doc filler corpus. The filler size matters: it keeps
    * the boundary index past the broadcast bar so the pair join runs
    * as the SMJ the threshold is calibrated for — with a broadcastable
    * index this fixture's stream side is SPREAD (range-generated), the
    * BHJ parallelizes the fan map-side, and the salt can only lose
    * (the r11 calibration detour, see BoundaryFanThreshold). */
  private def viralDocs(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val viral = s.range(0, 5000L)
      .select(col("id").as("doc_id"), lit("alpha beta gamma").as("text"))
    val filler = s.range(100000L, 1600000L)
      .select(col("id").as("doc_id"),
        concat(lit("w"), col("id").cast("string"), lit(" x"),
          col("id").cast("string"), lit(" y"), col("id").cast("string"),
          lit(" z"), col("id").cast("string")).as("text"))
    viral.unionByName(filler)
  }

  /** Star hub with ids on BOTH sides (node N/2 joined to every other
    * node) plus a ring for graph body — the id-ordered wedge stage's
    * worst case: the hub key receives (N/2)² wedge rows from KBs of
    * input, below every AQE skew threshold. */
  private[graft] def hubGraph(s: SparkSession, n: Long = 8001L): DataFrame = {
    import org.apache.spark.sql.functions._
    val hub = n / 2
    val ids = s.range(0, n).select(col("id"))
    val star = ids.filter(col("id") =!= hub).select(
      least(col("id"), lit(hub)).as("doc_a"),
      greatest(col("id"), lit(hub)).as("doc_b"))
    val ring = ids.filter(col("id") < n - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      // ring edges touching the hub already exist in the star
      .filter(col("doc_a") =!= hub && col("doc_b") =!= hub)
    star.union(ring)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 5
    val names =
      if (args.length > 2) args(2).split(",").toSeq else variants.keys.toSeq.sorted
    // any DECLARED query is measurable by its SparkEntry name without
    // hand-registering a variant (r12: mover attribution needs CONTROL
    // queries from untouched files in the same window as the suspects)
    def variantFor(n: String): (SparkSession, String) => DataFrame =
      variants.getOrElse(n, SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown variant/query: $n")))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-variant Spark-job counter (r12): a variant's wall divides into
    // compute and #jobs × round-trip latency; the count makes the
    // job-latency-sensitivity of a query (KMeans iterations, multi-scan
    // unions) a printed fact instead of a guess
    val jobCount = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); ()
        }
      })
    val jobsPerVariant = scala.collection.mutable.Map.empty[String, Long]
    def run(name: String): Double = {
      val j0 = jobCount.get()
      val t0 = System.nanoTime()
      variantFor(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are async; tolerate slight undercount — the
      // magnitude (1 vs dozens) is what matters for attribution
      jobsPerVariant(name) = jobCount.get() - j0
      dt
    }
    names.foreach(run) // warm
    val samples: Map[String, Seq[Double]] = (1 to passes)
      .flatMap(_ => names.map(n => n -> run(n)))
      .groupMap(_._1)(_._2)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    println(f"\n[perfab] $passes%d interleaved passes at $sfDir%s")
    names.foreach { n =>
      val xs = samples(n)
      println(f"[perfab] $n%-24s median ${median(xs)}%6.3fs  min ${xs.min}%6.3fs  " +
        f"jobs ${jobsPerVariant.getOrElse(n, -1L)}%3d  " +
        xs.map(x => f"$x%.3f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}
