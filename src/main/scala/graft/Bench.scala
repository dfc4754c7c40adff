package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * `SPARK_GRAFT_SF_DIR`, prints one JSON line
  * `{"metric":"total","value":sec,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Measurement notes:
  *  - a warm-up pass (session + codegen + parquet reader init) runs before
  *    any timing so the first query doesn't absorb JVM start-up;
  *  - each query is forced with a `noop` datasource write — unlike
  *    `count()`, this evaluates every projected column (count() lets
  *    Catalyst prune the projection entirely);
  *  - queries run in name order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)

    // untimed warm pass: JIT/codegen/file-index costs land here, so the
    // timed pass below measures steady-state throughput (the regime a
    // long-running cluster job actually operates in)
    ordered.foreach { case (_, fn) =>
      try force(fn(spark, sfDir)) catch { case _: Throwable => () }
    }

    // a failed query records null, never its time-to-failure — a broken
    // query must not masquerade as a fast one
    val results: Seq[(String, Option[Double])] = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val elapsed =
        try { force(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
        }
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.fold("null")(_.toString) }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val failed = results.collect { case (k, None) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    if (results.exists(_._2.isEmpty)) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
