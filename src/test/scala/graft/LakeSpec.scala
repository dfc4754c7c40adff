package graft

import java.nio.file.Files

import graft.sources.Lake
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-trip specs for the generic lake IO surface: schema-pinned
  * JSON/CSV readers and plain/partitioned parquet + CSV writers. */
class LakeSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("JSON and CSV reads apply the pinned schema; writes round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lake").toFile.getAbsolutePath
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "score")

    // json
    Files.write(java.nio.file.Paths.get(s"$dir/in.json"),
      """{"id":1,"name":"a","score":1.5}
        |{"id":2,"name":"b","score":2.5}
        |{"id":3,"name":"c","score":3.5}""".stripMargin.getBytes)
    val fromJson = Lake.readJson(spark, dir, schema)
    assert(fromJson.schema == schema)
    assert(fromJson.exceptAll(df).isEmpty && df.exceptAll(fromJson).isEmpty)

    // csv (writer then reader)
    Lake.writeCsv(df, s"$dir/csv")
    val fromCsv = Lake.readCsv(spark, s"$dir/csv", schema)
    assert(fromCsv.schema == schema)
    assert(fromCsv.exceptAll(df).isEmpty && df.exceptAll(fromCsv).isEmpty)

    // plain + partitioned parquet
    Lake.writePlain(df, s"$dir/plain")
    assert(Lake.readParquet(spark, s"$dir/plain").count() == 3)
    Lake.writePartitioned(df.withColumn("part", col("id") % 2), s"$dir/part", Seq("part"))
    assert(new java.io.File(s"$dir/part/part=1").isDirectory)
    assert(Lake.readParquet(spark, s"$dir/part").count() == 3)
  }
}
