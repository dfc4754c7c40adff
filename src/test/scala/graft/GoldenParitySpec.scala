package graft

import graft.sparkify.Pipelines
import org.apache.spark.sql.functions._

/** End-to-end parity against the reference's committed sample data
  * (`/root/reference/data`, read-only): the strongest evidence the five
  * pipelines reproduce the reference's observable behavior. Expected
  * values are the corpus statistics documented in SURVEY.md / FIXTURES.md
  * (measured from the same committed data): 8,056 log events in 30 files,
  * 6,820 NextSong rows, 286 anonymous rows, 97 distinct non-empty userIds,
  * 71 song files with 71 distinct song_ids and 69 distinct artist_ids.
  * Skips cleanly if the reference checkout is absent.
  */
class GoldenParitySpec extends SparkTestBase {

  private val logPath = "/root/reference/data/log-data"
  private val songPath = "/root/reference/data/song_data"
  private def refPresent = new java.io.File(logPath).isDirectory &&
    new java.io.File(songPath).isDirectory

  test("staging reads reproduce the documented corpus statistics") {
    assume(refPresent)
    val logs = Pipelines.readLogData(spark, logPath)
    assert(logs.count() == 8056)
    assert(logs.filter(col("page") === "NextSong").count() == 6820)
    assert(logs.filter(col("userId") === "").count() == 286)
    assert(logs.filter(col("userId") =!= "").select("userId").distinct().count() == 97)
    val songs = Pipelines.readSongData(spark, songPath)
    assert(songs.count() == 71)
    assert(songs.select("song_id").distinct().count() == 71)
    assert(songs.select("artist_id").distinct().count() == 69)
  }

  test("EtlMain runs the config-driven pipeline end-to-end with read-back") {
    assume(refPresent)
    val out = java.nio.file.Files.createTempDirectory("etlmain").toFile.getAbsolutePath
    val conf = sparkify.EtlMain.parseConf(Seq(
      "# sparkify lake config",
      "[io]",
      s"log_data = $logPath",
      s"song_data = $songPath",
      s"output = $out/lake"))
    val counts = sparkify.EtlMain.run(spark, conf).toMap
    assert(counts("songs") == 71)
    assert(counts("artists") == 69)
    assert(counts("users") >= 98)
    assert(counts("songplays") >= 6820)
    assert(counts("time") > 0)
    // partitioned hive layout reaches the lake (etl.py:106-110 shape)
    assert(new java.io.File(s"$out/lake/songplays").listFiles()
      .exists(_.getName.startsWith("year=")))
  }

  test("EtlMain accepts the reference template's [S3] key names") {
    val conf = sparkify.EtlMain.parseConf(Seq(
      "[S3]",
      "log_data = s3a://bucket/log_data/",
      "song_data = s3a://bucket/song_data/",
      "output_bucket = s3a://bucket/out"))
    assert(conf("s3.log_data") == "s3a://bucket/log_data/")
    assert(conf("s3.output_bucket") == "s3a://bucket/out")
  }

  test("five table builders reproduce reference semantics on real data") {
    assume(refPresent)
    val logs = Pipelines.readLogData(spark, logPath)
    val songData = Pipelines.readSongData(spark, songPath)

    val songs = Pipelines.songsTable(songData)
    assert(songs.count() == 71)

    val artists = Pipelines.artistsTable(songData)
    assert(artists.select("artist_id").distinct().count() == 69)

    val users = Pipelines.usersTable(logs)
    // one row per user (plus the anonymous ""), unless the user's max ts
    // ties — ties are kept, so rows >= distinct users
    val nUsers = logs.select("userId").distinct().count()
    assert(users.count() >= nUsers && nUsers == 98)
    assert(users.filter(col("userId") === "").count() >= 1)

    val songplays = Pipelines.songplaysTable(logs, songData)
    // fan-out can only add rows to the 6,820 NextSong events; title-only
    // matching means almost all song_ids are NULL on this corpus
    val n = songplays.count()
    assert(n >= 6820)
    val matched = songplays.filter(col("song_id").isNotNull).count()
    assert(matched > 0 && matched < 50, s"expected sparse matches, got $matched")

    val time = Pipelines.timeTable(logs)
    assert(time.count() == logs.select("ts").distinct().count())
    val golden = time.filter(col("start_time") === 1543505457796L).collect()
    assert(golden.length == 1)
    val g = golden.head
    // 2018-11-29T15:30:57Z — Thursday, ISO week 48 (UTC-pinned session)
    assert(g.getInt(1) == 15 && g.getInt(2) == 29 && g.getInt(3) == 48 &&
      g.getInt(4) == 11 && g.getInt(5) == 2018 && g.getInt(6) == 4)
  }

  test("SQL-string entry point builders equal the DSL forms on real data") {
    // the reference's primary API is spark.sql over temp views
    // (etl.py:132,160-162,197) — both surfaces must produce identical rows
    assume(refPresent)
    val logs = Pipelines.readLogData(spark, logPath)
    val songData = Pipelines.readSongData(spark, songPath)
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    assert(same(Pipelines.usersTableSql(spark, logs),
      Pipelines.usersTable(logs)))
    assert(same(Pipelines.songplaysTableSql(spark, logs, songData),
      Pipelines.songplaysTable(logs, songData)))
    assert(same(Pipelines.timeTableSql(spark, logs),
      Pipelines.timeTable(logs)))
  }
}
