package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming window semantics == batch semantics on the same input. */
class StreamingSpec extends SparkSpec {

  // streaming file source needs a DIRECTORY; stage the events file into one
  private val eventsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming tumbling agg (complete mode) equals batch groupBy") {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    val q = StreamingFeatures
      .tumblingAgg(stream, "1 day", "0 seconds")
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("t_out")
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark
      .table("t_out")
      .select(col("user_id"), col("win_start_us"), col("n"), round(col("avg_v"), 6).as("a"))
      .collect()
      .map(_.toSeq)
      .toSet
    val batch = spark.read.parquet(eventsPath)
      .withColumn("ts_t", col("ts").cast("timestamp"))
      .groupBy(window(col("ts_t"), "1 day"), col("user_id"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"))
      .select(col("user_id"), unix_micros(col("window.start")).as("win_start_us"),
        col("n"), round(col("avg_v"), 6).as("a"))
      .collect()
      .map(_.toSeq)
      .toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("streaming session_window produces gap-bounded sessions") {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    val q = StreamingFeatures
      .sessionAgg(stream, "6 hours", "0 seconds")
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("s_out")
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("s_out")
    assert(out.count() > 0)
    // every session span is a closed run: end - start bounded by n * gap
    val bad = out.where(
      col("session_end_us") - col("session_start_us") > col("n_rows") * lit(6L * 3600 * 1000000L))
    assert(bad.count() == 0L)
  }
}
