package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANSI posture, gate-checked: the engine's contract is ANSI-clean
  * execution (no silent overflow, no bad-cast nulls), previously audited
  * only by the `AnsiAudit` diagnostic main — a tool someone must
  * remember to run. This spec pins the property in the test gate for a
  * representative registry slice: every query must (a) EXECUTE under
  * `spark.sql.ansi.enabled=true` and (b) produce IDENTICAL rows in both
  * modes — if ANSI-off was silently papering over an overflow or a bad
  * cast with a null, the two runs would differ and this fails loudly.
  *
  * The slice spans the expression classes where the two modes can
  * diverge: arithmetic + casts (project_expr, case_cast_like), money
  * aggregation (q1_agg), string/date/json functions, windows, joins,
  * set ops, sketches, and the text/dedup pipelines' regex-heavy paths.
  * The full-registry sweep stays in AnsiAudit (it needs a dedicated
  * session); this is the always-on canary.
  */
class AnsiPostureSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  val slice = Seq("q1_agg", "project_expr", "case_cast_like",
    "string_functions", "date_functions", "json_functions",
    "window_running", "join_inner", "agg_having", "setop_except_all",
    "agg_approx_distinct", "text_stats", "dedup_exact", "lang_id",
    "grouped_topk")

  test("ANSI on/off: representative registry slice runs clean under " +
       "ANSI and returns identical rows in both modes") {
    def runAll(): Map[String, Seq[String]] = slice.map { name =>
      val rows = SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      name -> rows
    }.toMap
    val saved = spark.conf.getOption("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val off = runAll()
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val on = runAll() // any ANSI runtime error fails the test here
      for (name <- slice) {
        assert(on(name).size === off(name).size, s"$name row count")
        assert(on(name) === off(name), s"$name rows diverge across modes")
        assert(on(name).nonEmpty, s"$name returned nothing")
      }
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.ansi.enabled", v)
      case None => spark.conf.unset("spark.sql.ansi.enabled")
    }
  }
}
