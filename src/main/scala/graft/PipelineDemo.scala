package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline composed from the operator
  * library — the workflow a 100 TB corpus actually runs, demonstrating
  * that the pieces compose: ingest → quality score → language filter →
  * exact dedup → near-dup removal (MinHash-LSH) → deterministic sample →
  * token accounting → partitioned lake write.
  *
  * Every stage is embarrassingly parallel or bucket-shuffled (see each
  * operator's scale notes); nothing collects to the driver. The final
  * write partitions by language — the downstream-read pruning key.
  *
  * Usage: `runMain graft.PipelineDemo <sfDir> <outDir>`; returns per-stage
  * surviving-row counts on stdout (also exposed via [[curate]] for the
  * spec).
  */
object PipelineDemo {

  /** Runs the curation flow; returns (stage name → surviving docs). */
  def curate(spark: SparkSession, sfDir: String, outDir: String): Seq[(String, Long)] = {
    val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def stage(name: String, df: DataFrame): DataFrame = {
      counts += name -> df.count()
      df
    }

    val docs = stage("ingest", Tables.documents(spark, sfDir))

    // 1. quality: type-token ratio + length band (q32's scoring)
    val scored = operators.TextOps.q32Quality(spark, sfDir)
      .select(col("doc_id"), col("quality"))
    val quality = stage("quality_filter",
      docs.join(scored, Seq("doc_id")).filter(col("quality") >= 0.5))

    // 2. language: keep docs whose predicted language matches the label
    val lang = operators.TextOps.q31LangId(spark, sfDir)
      .select(col("doc_id"), col("pred"))
    val langKept = stage("lang_filter",
      quality.join(lang, Seq("doc_id")).filter(col("pred") === col("lang")))

    // 3. exact dedup: keep the smallest doc_id per content fingerprint
    val keep = operators.DedupOps.q34DedupExact(spark, sfDir)
      .select(col("keep_id").as("doc_id"))
    val exactDeduped = stage("exact_dedup", langKept.join(keep, Seq("doc_id")))

    // 4. near-dup removal: drop the larger id of every MinHash-LSH pair
    val nearDupLosers = operators.DedupOps.q36MinhashLsh(spark, sfDir)
      .select(col("doc_b").as("doc_id")).distinct()
    val nearDeduped = stage("near_dedup",
      exactDeduped.join(nearDupLosers, Seq("doc_id"), "left_anti"))

    // 5. deterministic holdout split: ~90% train by key hash (no RNG)
    val train = stage("train_split",
      nearDeduped.filter(pmod(functions.TextFns.hash60(
        concat(lit("split:"), col("doc_id"))), lit(100L)) < 90))

    // 6. token accounting for the budget report
    val tokens = operators.TextOps.q50BpeTokens(spark, sfDir)
      .select(col("doc_id"), col("n_bpe_tokens"))
    val curated = train.join(tokens, Seq("doc_id"))
      .select("doc_id", "lang", "source", "text", "n_bpe_tokens")

    // 7. partitioned lake write (language = downstream pruning key)
    sources.Lake.writePartitioned(curated, s"$outDir/curated", Seq("lang"))
    counts += "written" -> spark.read.parquet(s"$outDir/curated").count()
    counts.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("curate").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    curate(spark, sfDir, outDir).foreach { case (k, n) =>
      println(s"[pipeline] $k: $n docs")
    }
    spark.stop()
  }
}
