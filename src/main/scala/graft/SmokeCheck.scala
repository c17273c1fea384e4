package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: a bare session (no extensions, no
  * special confs) calling SparkEntry.entry and checking rows > 0.
  */
object SmokeCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE_ROWS=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
