package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * The reference hand-builds its execution substrate (exchanges, heartbeats,
  * compute claiming — exchange_operator.rs, operator_handler_state.rs); on
  * Spark all of that is the scheduler + shuffle service, so the "engine
  * bootstrap" reduces to session configuration chosen for large clusters:
  *
  *  - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  *    and dynamic broadcast conversion are the difference between a plan that
  *    works at sf0.01 and one that survives 100 TB with skewed keys.
  *  - shuffle.partitions defaults to the local core count here; on a real
  *    cluster you'd size it ~2-3x total cores and let AQE coalesce down.
  *  - UTC session timezone for oracle (DuckDB) parity.
  */
object GraftSession {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
