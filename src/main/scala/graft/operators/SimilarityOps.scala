package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorExprs.{quantized_dot, quantized_norm2}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over
  * `embeddings.embedding: array<float>`.
  *
  * Numeric contract: vectors are quantized to 1e-3 integer grids, all dot
  * products and norms are exact int64 arithmetic (magnitudes < 2^53), and
  * only the final `dot / sqrt(na2*nb2)` runs in IEEE double — both exactly
  * rounded ops — so cosine scores are bit-identical to the DuckDB oracle
  * and rankings are fully deterministic (ties broken by vec_id).
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * scans the corpus once — linear, no shuffle of the corpus. The LSH path
  * buckets the corpus by an 8-bit random-hyperplane signature (fixed
  * md5-derived planes) so each probe touches ~1/256 of the data; at 100 TB
  * the bucket id becomes the shuffle/partition key and queries join only
  * their bucket.
  */
object SimilarityOps {

  /** Fixed ±1 hyperplane coefficients, derived from md5("p:d") so the
    * DuckDB oracle can embed the same constants as literals. Any count
    * can be generated (the plane index is unbounded), which is what lets
    * the LSH band structure scale with the corpus. */
  private[operators] def planesFor(n: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(n, 64) { (p, d) =>
      val b = md.digest(s"$p:${d + 1}".getBytes("UTF-8"))(0)
      if ((b & 0x80) != 0) 1 else -1
    }
  }

  private[operators] val planes: Array[Array[Int]] = planesFor(8)

  /** Vectors with their exact int squared norm ([[VectorExprs]] fused
    * codegen expression — the float arrays travel as-is; quantization
    * happens inside the primitive loop). */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.widen(Tables.embeddings(s, dir), col("vec_id"))
      .select(col("vec_id"), col("label"), col("embedding").as("q"))
      .withColumn("n2", quantized_norm2(col("q")))

  private def cosine(qa: Column, qb: Column, na2: Column, nb2: Column): Column =
    quantized_dot(qa, qb).cast("double") / sqrt((na2 * nb2).cast("double"))

  /** Exact top-10 cosine neighbors for query vectors vec_id < 5: broadcast
    * the queries, single scan over the corpus, per-query top-k window. */
  def q39KnnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qq"), col("q"), col("qn2"), col("n2")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rn"))
  }

  val q39Sql: String =
    """WITH q AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
      |  FROM embeddings),
      |n AS (SELECT vec_id, q, list_sum(list_transform(q, x -> x * x)) AS n2 FROM q),
      |scored AS (
      |  SELECT qs.vec_id AS q_id, c.vec_id AS neighbor_id,
      |    CAST(list_sum(list_transform(range(1, len(qs.q) + 1), i -> qs.q[i] * c.q[i])) AS DOUBLE)
      |      / sqrt(CAST(qs.n2 * c.n2 AS DOUBLE)) AS cos
      |  FROM n qs JOIN n c ON qs.vec_id < 5 AND c.vec_id <> qs.vec_id)
      |SELECT q_id, neighbor_id, cos, rn FROM (
      |  SELECT q_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
      |  FROM scored) WHERE rn <= 10""".stripMargin

  /** LSH-bucketed ANN: 8-bit random-hyperplane signature buckets the
    * corpus; each query only scores its own bucket, top-3 by cosine.
    * (Recall vs q39 is validated in ScalaTest, not by the oracle.) */
  def q40KnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = quantized(s, dir)
    // quantized_dot against a ±1.0 plane = 1000 × Σ coef·q_i, so the sign
    // test is identical to the oracle's integer form
    val bucket = (0 until 8).map { p =>
      val plane = array(planes(p).toIndexedSeq.map(c => lit(c.toFloat)): _*)
      when(quantized_dot(col("q"), plane) > 0, 1L << p).otherwise(0L)
    }.reduce(_ + _)
    val eb = e.withColumn("bucket", bucket)
    val queries = eb.select(col("vec_id").as("q_id"), col("q").as("qq"),
      col("n2").as("qn2"), col("bucket"))
      .filter(col("q_id") < 5)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    eb.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qq"), col("q"), col("qn2"), col("n2")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rn"))
  }

  val q40Sql: String = {
    val planeLits = (0 until 8).map { p =>
      planes(p).mkString("[", ", ", "]")
    }
    val bucketExpr = (0 until 8).map { p =>
      s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> q[i] * (${planeLits(p)})[i])) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" +\n    ")
    s"""WITH qv AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
       |  FROM embeddings),
       |n AS (SELECT vec_id, q, list_sum(list_transform(q, x -> x * x)) AS n2 FROM qv),
       |b AS (
       |  SELECT vec_id, q, n2,
       |    $bucketExpr AS bucket
       |  FROM n),
       |scored AS (
       |  SELECT qs.vec_id AS q_id, c.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(qs.q) + 1), i -> qs.q[i] * c.q[i])) AS DOUBLE)
       |      / sqrt(CAST(qs.n2 * c.n2 AS DOUBLE)) AS cos
       |  FROM b qs JOIN b c ON qs.bucket = c.bucket AND qs.vec_id < 5 AND c.vec_id <> qs.vec_id)
       |SELECT q_id, neighbor_id, cos, rn FROM (
       |  SELECT q_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM scored) WHERE rn <= 3""".stripMargin
  }

  /** Per-dimension corpus statistics via posexplode: exact quantized sums
    * and min/max per embedding position (the "column profile" pass a
    * vector pipeline runs before choosing an index). */
  def q48DimStats(s: SparkSession, dir: String): DataFrame =
    Tables.widen(Tables.embeddings(s, dir), col("vec_id"))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("pos").cast("long").as("pos"),
        floor(col("x").cast("double") * 1000 + 0.5).cast("long").as("q"))
      .groupBy(col("pos"))
      .agg(sum(col("q")).as("sum_q"), min(col("q")).as("min_q"),
        max(col("q")).as("max_q"), count(lit(1)).as("n"))

  val q48Sql: String =
    """SELECT i - 1 AS pos,
      |  CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_q,
      |  min(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS min_q,
      |  max(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS max_q,
      |  count(*) AS n
      |FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
      |GROUP BY pos""".stripMargin

  /** IVF-style ANN: a KMeans coarse quantizer (k=16, fixed seed) assigns
    * every vector to a cell; each query probes its 2 nearest cells and
    * scores exact quantized cosine inside them. Rows-only (training is
    * not SQL-expressible); recall vs the brute-force q39 is spec-checked.
    * At 100 TB: centroids are tiny and broadcast; the corpus is
    * partitioned by cell id, so a probe touches nprobe/k of the data. */
  def q52KnnIvf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = quantized(s, dir)
      .withColumn("features", array_to_vector(col("q")))
    val model = new KMeans().setK(16).setSeed(42).setMaxIter(10)
      .setFeaturesCol("features").fit(e)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("q"), col("n2"), col("prediction").as("cell"))
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }.toSeq
    val cdf = s.createDataFrame(centroids).toDF("cell", "centroid")
    // nearest 2 cells per query by exact quantized cosine to the centroid
    val wc = Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("cell").asc)
    val probes = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("n2").as("qn2"))
      .crossJoin(broadcast(cdf))
      .withColumn("ccos", quantized_dot(col("qq"), col("centroid")).cast("double")
        / sqrt((col("qn2") * quantized_norm2(col("centroid"))).cast("double")))
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= 2)
      .select(col("q_id"), col("qq"), col("qn2"), col("cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qq"), col("q"), col("qn2"), col("n2")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rn"))
  }

  /** int8 scalar-quantized kNN — the 4×-memory-compression retrieval
    * path: each vector is quantized to per-vector-scaled int8 codes
    * (⌊x/maxabs·127+0.5⌋), and ranking uses the cosine of the CODES —
    * the per-vector scale cancels in the cosine, so no rescale is
    * needed. At 100 TB this is what makes the corpus side fit in
    * memory-mapped storage (int8 codes + one float scale per vector vs
    * 4-byte floats), with exact int64 dot products on the compressed
    * form; candidate structure (brute / LSH / IVF) is orthogonal and
    * unchanged. The quantization is deterministic, so unlike most ANN
    * variants this one is fully ORACLE-CHECKED; fidelity vs the float
    * ranking (q39) is spec-asserted as recall@10. */
  def q93KnnInt8(s: SparkSession, dir: String): DataFrame = {
    // fused codegen quantization (maxabs + ⌊x/scale·127+0.5⌋ in one
    // pass) — the interpreted aggregate+transform chain was q93's actual
    // bottleneck, not the pairwise dot
    val e = Tables.widen(Tables.embeddings(s, dir), col("vec_id"))
      .select(col("vec_id"),
        graft.functions.VectorExprs.int8_codes(col("embedding")).as("q8"))
      .withColumn("n2", graft.functions.VectorExprs.long_dot(col("q8"), col("q8")))
      .select(col("vec_id"), col("q8"), col("n2"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("q8").as("qq"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos8").desc, col("vec_id").asc)
    e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      // the pairwise hot path (pairs × dims): codegen'd LongDot, not an
      // interpreted zip_with+aggregate chain (CodegenFallback, boxed per
      // element) — same exact int64 arithmetic, so the hash is unchanged
      .withColumn("cos8",
        graft.functions.VectorExprs.long_dot(col("qq"), col("q8")).cast("double")
          / sqrt((col("qn2") * col("n2")).cast("double")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos8"), col("rn"))
  }

  val q93Sql: String =
    """WITH sc AS (
      |  SELECT vec_id,
      |    greatest(list_max(list_transform(embedding,
      |      x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS scale,
      |    embedding
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) / scale * 127 + 0.5) AS BIGINT)) AS q8
      |  FROM sc),
      |n AS (SELECT vec_id, q8,
      |        CAST(list_sum(list_transform(q8, x -> x * x)) AS BIGINT) AS n2
      |      FROM q),
      |scored AS (
      |  SELECT qs.vec_id AS q_id, c.vec_id AS neighbor_id,
      |    CAST(list_sum(list_transform(range(1, len(qs.q8) + 1),
      |      i -> qs.q8[i] * c.q8[i])) AS DOUBLE)
      |      / sqrt(CAST(qs.n2 * c.n2 AS DOUBLE)) AS cos8
      |  FROM n qs JOIN n c ON qs.vec_id < 5 AND c.vec_id <> qs.vec_id)
      |SELECT q_id, neighbor_id, cos8, rn FROM (
      |  SELECT q_id, neighbor_id, cos8,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cos8 DESC, neighbor_id)
      |      AS rn
      |  FROM scored) WHERE rn <= 10""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q39_knn_brute", q39KnnBrute, Some(q39Sql)),
    QueryDef("q93_knn_int8", q93KnnInt8, Some(q93Sql)),
    QueryDef("q40_knn_lsh", q40KnnLsh, Some(q40Sql)),
    QueryDef("q48_dim_stats", q48DimStats, Some(q48Sql)),
    QueryDef("q52_knn_ivf", q52KnnIvf, None))
}
