package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point mirroring the reference's client surface.
  *
  * The reference parses SQL with sqlparser-rs, requires exactly one
  * statement per run (logical_planner.rs:209-216), splits multi-statement
  * scripts client-side (test_sqlparser_behavior.rs:6-27), and exposes ONE
  * table source: the `read_files('<glob>' [, connection=>'name'])` table
  * function (read_files_task.rs:64-115). Spark's parser handles everything
  * else; the only custom piece is rewriting `read_files(...)` calls into
  * registered temp views backed by DataFrameReader — after which Catalyst
  * sees a plain relation and pushdown/pruning work as usual.
  */
object QueryFacade {

  /** Error taxonomy mirroring the reference's PlanError
    * (logical_planner.rs:13-21).
    */
  sealed abstract class PlanError(msg: String) extends Exception(msg)
  final class MultipleStatements(n: Int)
    extends PlanError(s"expected exactly 1 statement, got $n")
  final class EmptyQuery extends PlanError("empty query")

  /** Split a SQL script into statements on top-level semicolons (quote- and
    * comment-aware) — the client-side batch splitting the reference tests
    * in test_sqlparser_behavior.rs.
    */
  def splitStatements(script: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inSingle = false
    var inDouble = false
    var inLineComment = false
    while (i < script.length) {
      val c = script.charAt(i)
      if (inLineComment) {
        cur.append(c)
        if (c == '\n') inLineComment = false
      } else if (inSingle) {
        cur.append(c)
        if (c == '\'') inSingle = false
      } else if (inDouble) {
        cur.append(c)
        if (c == '"') inDouble = false
      } else c match {
        case ';' => out += cur.result(); cur.clear()
        case '\'' => inSingle = true; cur.append(c)
        case '"' => inDouble = true; cur.append(c)
        case '-' if i + 1 < script.length && script.charAt(i + 1) == '-' =>
          inLineComment = true; cur.append(c)
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val ReadFilesRe =
    """(?i)read_files\s*\(\s*'([^']+)'\s*(?:,\s*connection\s*=>\s*'([^']+)'\s*)?\)""".r

  /** Rewrite every `read_files('glob'[, connection=>'conn'])` into a temp
    * view over `spark.read.parquet(glob)`. The `connection` argument
    * resolves through the [[graft.sources.Connections]] registry (the
    * reference's OpenDAL fs/S3 connections ≈ Hadoop `file://`/`s3a://`
    * URIs + per-bucket s3a credentials on the session conf).
    */
  /** Rewrite, collecting the created view names so the caller can drop
    * them once the statement is ANALYZED. View names are UUID-unique:
    * temp views are session-global, so a fixed numbering raced between
    * AsyncQueryRunner's concurrent submits (one query could silently read
    * the other's table).
    */
  private def rewriteCollect(spark: SparkSession,
                             sql: String): (String, Seq[String]) = {
    val views = Vector.newBuilder[String]
    val out = ReadFilesRe.replaceAllIn(sql, m => {
      val glob = m.group(1)
      val conn = Option(m.group(2))
      val path = conn match {
        case Some(name) => graft.sources.Connections.resolve(spark, name, glob)
        case None => glob
      }
      val view = "graft_read_files_" +
        java.util.UUID.randomUUID().toString.replace("-", "_")
      graft.sources.Tables.readFiles(spark, path).createOrReplaceTempView(view)
      views += view
      view
    })
    (out, views.result())
  }

  /** Public rewrite hook (diagnostics/tests). NOTE: the created temp
    * views are left registered — callers wanting cleanup should go
    * through [[run]]/[[runScript]], which drop them after analysis.
    */
  def rewriteReadFiles(spark: SparkSession, sql: String): String =
    rewriteCollect(spark, sql)._1

  /** DDL statements whose STORED TEXT will re-reference the rewritten
    * views at every later analysis (CREATE/ALTER [TEMP] VIEW stores
    * parsed text, not a resolved plan) — for these the views must outlive
    * the statement. Leading line comments are skipped before matching
    * (splitStatements keeps them inside the statement).
    */
  private val CreatesViewRe =
    ("""(?is)^(create\s+(or\s+replace\s+)?(global\s+)?(temp(orary)?\s+)?""" +
      """|alter\s+)view\b.*""").r

  private def definesView(stmt: String): Boolean =
    CreatesViewRe.matches(
      stmt.replaceAll("(?m)^\\s*--[^\\n]*$", "").trim)

  /** The rewritten statement handed to Catalyst; `spark.sql` analyzes
    * eagerly (the resolved plan owns the relation), so the temp views are
    * dropped immediately — nothing leaks into the session catalog and
    * concurrent statements can't observe each other's views. Exception:
    * a CREATE VIEW statement keeps them (its stored definition re-resolves
    * the view names on every later reference).
    */
  private def analyzeAndClean(spark: SparkSession, stmt: String): DataFrame = {
    val (rewritten, views) = rewriteCollect(spark, stmt)
    val df =
      try spark.sql(rewritten)
      catch { case e: Throwable =>
        views.foreach(spark.catalog.dropTempView); throw e
      }
    if (!definesView(stmt)) views.foreach(spark.catalog.dropTempView)
    df
  }

  /** Run one statement (the reference's RunQuery path): validate arity,
    * rewrite read_files, hand to Catalyst.
    */
  def run(spark: SparkSession, sql: String): DataFrame = {
    val stmts = splitStatements(sql)
    if (stmts.isEmpty) throw new EmptyQuery
    if (stmts.length > 1) throw new MultipleStatements(stmts.length)
    analyzeAndClean(spark, stmts.head)
  }

  /** Run a multi-statement script, returning the result of each statement
    * (the reference TUI's batch mode).
    */
  def runScript(spark: SparkSession, script: String): Seq[DataFrame] =
    splitStatements(script).map(s => analyzeAndClean(spark, s))
}
