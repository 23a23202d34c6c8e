package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Catalog-wide physical-plan audit: one line per query with the plan
  * facts that matter at 100 TB — shuffle-exchange count, broadcast count,
  * cross-product/nested-loop joins, and unpartitioned window operators.
  * Run it after adding operators; anything surprising here is a scale bug
  * before it is a perf bug. (PlanShapeSpec pins the per-query invariants;
  * this is the sweep that finds the next pin.)
  *
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.001"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // audit the static plan: AQE would hide the pre-runtime shape
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"query"}%-28s shuf bcast cartesian bnlj gwindow")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        def count(p: SparkPlan => Boolean): Int = {
          var n = 0
          plan.foreachWithSubqueries(x => if (p(x)) n += 1)
          n
        }
        val shuffles = count(_.isInstanceOf[ShuffleExchangeExec])
        val bcasts = count(_.isInstanceOf[BroadcastExchangeExec])
        val cart = count(_.isInstanceOf[CartesianProductExec])
        val bnlj = count(_.isInstanceOf[BroadcastNestedLoopJoinExec])
        val gwin = count {
          case w: WindowExec => w.partitionSpec.isEmpty
          case _ => false
        }
        val flag = if (cart > 0 || bnlj > 0 || gwin > 0) "  <--" else ""
        println(f"$name%-28s $shuffles%4d $bcasts%5d $cart%9d $bnlj%4d $gwin%7d$flag")
      } catch {
        case t: Throwable => println(f"$name%-28s ERROR ${t.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
