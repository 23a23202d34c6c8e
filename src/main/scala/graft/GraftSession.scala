package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration: shuffle
  * partitions sized to cores (not the 200 default), UTC session timezone
  * (oracle parity), AQE on, and graft's native functions registered.
  * The driver's own mains configure sessions themselves; this is the
  * entry point for library users and notebooks. */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]"), cores)

  /** For cluster deploys: caller supplies master/deploy settings, graft
    * supplies the engine config. Shuffle partitions should be ~2-3x total
    * executor cores (ARCHITECTURE.md §2). */
  def configure(builder: SparkSession.Builder, shufflePartitions: Int): SparkSession = {
    val spark = builder
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    graft.plans.GraftExtensions.install(spark)
    spark
  }
}
