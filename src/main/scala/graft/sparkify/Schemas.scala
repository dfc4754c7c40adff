package graft.sparkify

import org.apache.spark.sql.types._

/** Fixed input schemas for the Sparkify parity pipelines, transliterated
  * from the reference's DDL strings (`/root/reference/schema.py:5-37`).
  * Types are deliberately exact: FLOAT stays 32-bit ([[FloatType]] — the
  * reference's precision loss on `registration`/`duration` is observable
  * behavior), `ts` is epoch **milliseconds** BIGINT, and `userId` is a
  * STRING that takes `""` for anonymous events.
  */
object Schemas {

  /** `log_data_schema`, reference `schema.py:5-24` (18 columns). */
  val logData: StructType = StructType(Seq(
    StructField("artist", StringType),
    StructField("auth", StringType),
    StructField("firstName", StringType),
    StructField("gender", StringType),
    StructField("itemInSession", IntegerType),
    StructField("lastName", StringType),
    StructField("length", FloatType),
    StructField("level", StringType),
    StructField("location", StringType),
    StructField("method", StringType),
    StructField("page", StringType),
    StructField("registration", FloatType),
    StructField("sessionId", IntegerType),
    StructField("song", StringType),
    StructField("status", IntegerType),
    StructField("ts", LongType),
    StructField("userAgent", StringType),
    StructField("userId", StringType)))

  /** `song_data_schema`, reference `schema.py:26-37` (10 columns). */
  val songData: StructType = StructType(Seq(
    StructField("num_songs", IntegerType),
    StructField("artist_id", StringType),
    StructField("artist_latitude", FloatType),
    StructField("artist_longitude", FloatType),
    StructField("artist_location", StringType),
    StructField("artist_name", StringType),
    StructField("song_id", StringType),
    StructField("title", StringType),
    StructField("duration", FloatType),
    StructField("year", IntegerType)))
}
