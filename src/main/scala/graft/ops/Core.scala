package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational building blocks shared by the pipelines
  * (SURVEY.md §2.5 W2/W3, §2.7). All are single-shuffle formulations:
  * one `Window`/`groupBy` exchange on the partition key, nothing else —
  * at 100 TB the shuffle on the key is unavoidable, everything around it
  * stays map-side.
  */
object Core {

  /** W2 — dedup-to-latest: keep the newest row per key ("latest crawl wins",
    * ref: functions/exchange_rate_trigger.py:14-19 re-crawl + overwrite
    * semantics at _archive/function_app.py:203). `order` must be a total
    * order (include a unique tiebreak column) for deterministic output. */
  def dedupLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** W3 — top-k per group (ref: commented cheapest-flight-per-city,
    * _archive/flight_avg_merge.py:67-74). */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** §2.7 — union of homogeneous frames (ref: pd.concat at
    * _archive/function_app.py:183). Name-based so column order is free. */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_.unionByName(_))
}
