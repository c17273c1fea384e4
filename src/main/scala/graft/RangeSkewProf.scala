package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostic main: the plain per-suppkey RANGE-frame window vs the
  * ghost-row rewrite ([[graft.operators.Skew.windowRangeSkew]]) on the
  * same corpus — the adjacent-pair control the registry lacks (the
  * registry's plain `window_range_frame` keys on orders.o_custkey, a
  * different table and shape). Both forced through the noop sink.
  *
  * Usage: runMain graft.RangeSkewProf [sfDir]
  */
object RangeSkewProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Partitioning.autoTune(spark, dir)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_orderkey"))
      .rangeBetween(-graft.operators.Skew.RangeSkewW, 0)
    def plain = graft.sources.Tables.table(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .withColumn("rng_sum", sum(col("l_quantity").cast("long")).over(w))
      .withColumn("rng_n", count(lit(1)).over(w))
    // rewrite first: charges warmup to the REWRITE, so the plain-side
    // number is, if anything, flattered
    val rw = time(noop(graft.operators.Skew.windowRangeSkew(spark, dir)))
    val pl = time(noop(plain))
    val rw2 = time(noop(graft.operators.Skew.windowRangeSkew(spark, dir)))
    val pl2 = time(noop(plain))
    println(f"""{"range_skew_prof":{"dir":"$dir","rewrite_s":[$rw%.2f,$rw2%.2f],"plain_s":[$pl%.2f,$pl2%.2f]}}""")
    spark.stop()
  }
}
