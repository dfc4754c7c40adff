package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Generic data-lake ingestion/egress surface (SURVEY §2.1 generalized).
  *
  * Readers always take an explicit schema — at 100 TB, schema inference
  * is a full extra pass over the data and a correctness hazard (a single
  * malformed file flips a column to string). Writers are the reference's
  * two sink shapes: plain and hive-partitioned snappy parquet; an S3 lake
  * differs only by an `s3a://` path prefix (credentials via
  * `spark.hadoop.fs.s3a.*` session conf, committer handled by Spark —
  * no shell-out sync like the reference's `aws s3 cp`).
  */
object Lake {

  def readJson(spark: SparkSession, path: String, schema: StructType,
      recursive: Boolean = true): DataFrame =
    spark.read
      .option("recursiveFileLookup", recursive.toString)
      .schema(schema).json(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .schema(schema).csv(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writePlain(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "snappy").parquet(path)

  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite")
      .option("compression", "snappy").parquet(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)
}
