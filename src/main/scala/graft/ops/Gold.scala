package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J6 — the multi-source "attractiveness" gold join (SURVEY.md §2.3 J6):
  * the daily Databricks batch the reference describes but does not ship
  * (README.md:84-85,107). LEFT joins from the master dimension so coverage
  * is 100% even when a source is missing a country — the exact master-data
  * design README.md:119 credits with fixing the ~10%-coverage problem.
  *
  * Scale notes: the master dim drives the join order; every per-source
  * score table is keyed by the dim key, so at 100 TB each input is one
  * keyed aggregate (shuffle on the key) and the final join is broadcast
  * (dim-sized) — no fact-to-fact shuffle join anywhere.
  */
object Gold {

  /** LEFT-join per-source score tables onto the master dim and compute the
    * weighted final score; missing sources contribute 0 via coalesce
    * (never drop a master row). */
  def attractiveness(
      master: DataFrame,
      key: String,
      sources: Seq[(DataFrame, String, Double)]): DataFrame = {
    val joined = sources.foldLeft(master) { case (acc, (src, scoreCol, _)) =>
      acc.join(src.select(col(key), col(scoreCol)), Seq(key), "left")
    }
    val weighted = sources
      .map { case (_, c, w) => coalesce(col(c), lit(0.0)) * w }
      .reduce(_ + _)
    joined.withColumn("attractiveness_score",
      RefFunctions.round2(RefFunctions.clamp(weighted, 0.0, 100.0)))
  }
}
