package graft

import graft.sources.Tables
import graft.streaming.StreamingSessions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events table has shipped in two physical parquet encodings
  * across driver-side testdata regenerations: `ts` as plain INT64
  * epoch-nanoseconds, and `ts` as TIMESTAMP_MICROS (isAdjustedToUTC=0
  * → Spark TIMESTAMP_NTZ). Round 3 lost the ENTIRE events query
  * surface (67 queries, 27 tests) because only the first encoding was
  * handled — this spec pins BOTH paths, batch and streaming, so a
  * future regeneration can't silently zero a round again.
  */
class EventsEncodingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** One tiny fixture written in both encodings; values straddle a
    * microsecond boundary's worth of interesting digits.
    */
  private val usValues = Seq(
    (1L, 1704085798778549L, 10L, "view", 1.5),
    (1L, 1704085801000000L, 10L, "purchase", 2.5),
    (2L, 1704085925123456L, 11L, "view", -3.25))

  /** Write a one-file `events.parquet` (a FILE, like the driver's
    * testdata, not a parquet directory — the streaming glob filter
    * matches leaf files).
    */
  private def writeSingleFile(df: org.apache.spark.sql.DataFrame, dir: String): Unit = {
    val staging = s"$dir/_staging"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staging))
  }

  private def writeFixtures(): (String, String) = {
    val longDir = java.nio.file.Files.createTempDirectory("graft-enc-ns").toString
    val tsDir = java.nio.file.Files.createTempDirectory("graft-enc-us").toString
    val base = usValues.toDF("event_id", "us", "user_id", "event_type", "value")
    // int64-ns encoding: a raw long column named ts
    writeSingleFile(base.select(col("event_id"), (col("us") * 1000L).as("ts"),
      col("user_id"), col("event_type"), col("value")), longDir)
    // timestamp-µs NTZ encoding (session tz is pinned UTC in
    // TestSpark, so the timestamp→ntz render is exact)
    writeSingleFile(base.select(col("event_id"),
      timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"), col("user_id"),
      col("event_type"), col("value")), tsDir)
    (longDir, tsDir)
  }

  /** The third physical possibility: TIMESTAMP_MICROS with
    * isAdjustedToUTC=1, which Spark reads as TimestampType.
    */
  private def writeUtcAdjustedFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-enc-utc").toString
    val base = usValues.toDF("event_id", "us", "user_id", "event_type", "value")
    writeSingleFile(base.select(col("event_id"),
      timestamp_micros(col("us")).as("ts"), col("user_id"),
      col("event_type"), col("value")), dir)
    dir
  }

  test("batch read canonicalizes all three encodings to identical epoch-ns longs") {
    val (longDir, tsDir) = writeFixtures()
    val utcDir = writeUtcAdjustedFixture()
    val expected = usValues.map { case (eid, us, _, _, _) => eid -> us * 1000L }.toMap
    for (dir <- Seq(longDir, tsDir, utcDir)) {
      val got = Tables.events(spark, dir)
        .select("event_id", "ts").as[(Long, Long)].collect().toMap
      assert(got == expected, s"encoding at $dir")
      assert(Tables.events(spark, dir).schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
    }
  }

  test("timestamp reads are independent of the session timezone") {
    // round 4 nearly shipped unix_micros(to_utc_timestamp(ts,'UTC')),
    // which shifts every epoch by the session-zone offset — this pin
    // reads the NTZ and UTC-adjusted fixtures under a non-UTC session
    // and requires the exact UTC-session values
    val (_, tsDir) = writeFixtures()
    val utcDir = writeUtcAdjustedFixture()
    val expected = usValues.map { case (eid, us, _, _, _) => eid -> us * 1000L }.toMap
    val ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    for (dir <- Seq(tsDir, utcDir)) {
      val got = Tables.events(ny, dir)
        .select("event_id", "ts").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"session-timezone-dependent read at $dir")
    }
  }

  test("NTZ wall times inside a DST spring-forward gap survive a non-UTC session") {
    // 2024-03-10T02:30:00 does not exist as a New York local time — a
    // session-zone ntz→timestamp coercion maps it forward (+1h), which
    // is how the timestampdiff-based read silently corrupted gap
    // rows. The UTC-pinned cast must return the exact stored micros.
    val gapUs = 1710037800000000L // 2024-03-10T02:30:00 wall, as µs-since-epoch-wall
    val dir = java.nio.file.Files.createTempDirectory("graft-enc-gap").toString
    writeSingleFile(
      Seq((1L, gapUs)).toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")), dir)
    val ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    val got = Tables.events(ny, dir).select("ts").head.getLong(0)
    assert(got == gapUs * 1000L, s"DST-gap wall time shifted: $got")
  }

  test("series view is bit-identical across encodings") {
    val (longDir, tsDir) = writeFixtures()
    val a = Tables.series(spark, longDir).orderBy("event_id").collect().toSeq
    val b = Tables.series(spark, tsDir).orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("streaming session path reads both encodings identically") {
    val (longDir, tsDir) = writeFixtures()
    val a = StreamingSessions.run(spark, longDir, "enc_sessions_ns")
      .orderBy("user_id", "session_id").collect().toSeq
    val b = StreamingSessions.run(spark, tsDir, "enc_sessions_us")
      .orderBy("user_id", "session_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  // ── q64/q85 batch parity on the real (micros-encoded) testdata —
  // these two returned silently WRONG rows in round 3 (the worst
  // failure mode), so the stream result is pinned row-for-row against
  // the equivalent batch computation, not just a row count.

  test("q64 stream windowed agg equals the batch equivalent row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val batch = Tables.events(spark, dir)
      .selectExpr("user_id",
        "timestamp_seconds(cast(ts div 1000 as double) / 1e6) as ets", "value")
      .groupBy(col("user_id"), window(col("ets"), "1 day"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("value") * lit(1e6)).cast("bigint")).cast("double") / lit(1e6), 4)
          .as("total"))
      .select(col("user_id"), col("window.start").cast("long").as("day_start"),
        col("n"), col("total"))
      .orderBy("user_id", "day_start").collect().toSeq
    val stream = StreamingSessions.runWindowed(spark, dir, "enc_q64")
      .orderBy("user_id", "day_start").collect().toSeq
    assert(stream == batch && stream.nonEmpty)
  }

  test("q85 stream interval join equals the batch self-join row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        col("event_type"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_event"), col("us").as("p_us"))
    val c = e.filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("c_user"), col("event_id").as("c_event"), col("us").as("c_us"))
    val batch = p.join(c, col("p_user") === col("c_user") &&
        col("c_us") >= col("p_us") - lit(21600000000L) && col("c_us") <= col("p_us"))
      .select(col("p_user").as("user_id"), col("p_event"), col("c_event"),
        ((col("p_us") - col("c_us")).cast("double") / lit(1e6)).as("dt"))
      .orderBy("user_id", "p_event", "c_event").collect().toSeq
    val stream = StreamingSessions.runStreamJoin(spark, dir, "enc_q85")
      .orderBy("user_id", "p_event", "c_event").collect().toSeq
    assert(stream == batch && stream.nonEmpty)
  }
}
