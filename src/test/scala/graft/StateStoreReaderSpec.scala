package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Spark 4 state-store reader (`statestore` / `state-metadata` data
  * sources): the operability surface for streaming state — inspect WHAT a
  * stateful query has accumulated in its checkpoint without touching the
  * running query. At 100 TB this is how state-size regressions, skewed
  * keys, and watermark bugs get debugged: read the checkpoint as a
  * DataFrame, aggregate it like any table. The spec pins that the state
  * read back from a count-aggregation checkpoint equals the batch answer,
  * and that the metadata source names the stateful operator. */
class StateStoreReaderSpec extends SparkSpec {
  import spark.implicits._

  test("statestore source reads aggregation state matching the batch answer") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-statestore").toString
    val rows = Seq(
      (0L, Timestamp.valueOf("2024-01-01 00:00:10"), 1L, "click", 1.0),
      (1L, Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "click", 2.0),
      (2L, Timestamp.valueOf("2024-01-01 00:02:00"), 2L, "view", 4.0),
      (3L, Timestamp.valueOf("2024-01-01 00:03:00"), 2L, "click", 8.0),
      (4L, Timestamp.valueOf("2024-01-01 00:04:00"), 3L, "view", 16.0))
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    stream.addData(rows: _*)
    val sdf = stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = sdf.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
      .writeStream
      .format("memory").queryName("ssr_out").outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()

    val state = spark.read.format("statestore").load(ckpt)
      // the value struct carries the aggregation BUFFER fields (count,
      // sum), not the output aliases — state is the physical accumulator
      .select($"key.event_type".as("event_type"),
        $"value.count".as("n"), $"value.sum".as("sv"))
      .orderBy($"event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(state.toSeq == Seq(("click", 3L, 11.0), ("view", 2L, 20.0)),
      s"state read-back mismatch: ${state.toSeq}")

    val meta = spark.read.format("state-metadata").load(ckpt)
    val ops = meta.select($"operatorName").collect().map(_.getString(0)).toSet
    assert(ops == Set("stateStoreSave"),
      s"metadata should name the stateful operator, got $ops")
  }
}
