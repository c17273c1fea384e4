package graft.exec

import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors, ThreadFactory}
import org.apache.spark.sql.SparkSession

/** Asynchronous query lifecycle — the reference's client contract:
  * `run_query` returns a query id immediately, `get_query_status` polls a
  * status enum, `wait_for_query_to_finish` polls until a terminal state
  * (async_query_client.rs:40-115), and results are then paged by cursor.
  *
  * Status vocabulary maps the reference's
  * (query_handler_state.rs:28-60) onto Spark's execution model: Queued
  * (accepted, not yet scheduled), Running (driver thread executing the
  * plan — Spark's scheduler owns per-stage dispatch, so SendingToWorker
  * collapses into Running), SentShutdown (cancellation requested via the
  * query's job group), Complete (result materialized), Error(msg).
  *
  * Execution runs on daemon threads; each query gets a Spark job group
  * named by its query id, so `cancel` maps to
  * `sparkContext.cancelJobGroup` — the Spark-native equivalent of the
  * reference's shutdown message to the worker.
  */
final class AsyncQueryRunner(spark: SparkSession, resultRoot: String) {
  import AsyncQueryRunner._

  private val states = new ConcurrentHashMap[String, QueryStatus]()
  private val pool = Executors.newCachedThreadPool(new ThreadFactory {
    override def newThread(r: Runnable): Thread = {
      val t = new Thread(r, "graft-async-query")
      t.setDaemon(true)
      t
    }
  })

  private val partials =
    new ConcurrentHashMap[String, Vector[ResultMaterializer.ResultFile]]()

  private val metricsMap =
    new ConcurrentHashMap[String, QueryMetrics.Summary]()

  /** Execution-cost summary of a COMPLETED query (scan rows, files
    * read, shuffle volume, duration) — the operational introspection
    * the reference's status vocabulary lacks; served over the wire in
    * GetQueryStatusResp's Complete body.
    */
  def metrics(queryId: String): Option[QueryMetrics.Summary] =
    Option(metricsMap.get(queryId))

  /** Commit progress of a RUNNING incremental query — files and rows
    * committed so far, monotonically growing (the partials vector is
    * append-only). The mid-flight introspection served over the wire by
    * GetQueryMetrics while terminal metrics don't exist yet; None for
    * non-incremental queries (nothing is committed before Complete).
    */
  def progress(queryId: String): Option[Progress] =
    Option(partials.get(queryId)).map(fs =>
      Progress(fs.size.toLong, fs.iterator.map(_.rowGroupRows.sum).sum))

  /** Materialize + capture the write's cost. The v1 parquet write plans
    * its OWN QueryExecution (the submitted frame's metrics stay empty),
    * so the only exact source is the QueryExecutionListener callback —
    * attributed to THIS query by the unique query id embedded in the
    * insert command's output path, so concurrent queries can never
    * cross-capture. The listener bus is async: the await gives the
    * event a bounded window to land after the write returns (ms in
    * practice); on timeout the query completes without metrics rather
    * than blocking the serving path.
    */
  private def materializeAndProfile(df: org.apache.spark.sql.DataFrame,
      queryId: String): ResultMaterializer.ResultSet = {
    val captured = new java.util.concurrent.atomic.AtomicReference[
      (org.apache.spark.sql.execution.QueryExecution, Long)]()
    val latch = new java.util.concurrent.CountDownLatch(1)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = qe.analyzed match {
        case c: org.apache.spark.sql.execution.datasources
            .InsertIntoHadoopFsRelationCommand
            if c.outputPath.toString.contains(queryId) =>
          captured.set((qe, durationNs)); latch.countDown()
        case _ => ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    def attach(): Unit =
      Option(captured.get()).foreach { case (qe, d) =>
        metricsMap.put(queryId, QueryMetrics.summarize(qe, d))
      }
    spark.listenerManager.register(listener)
    var detached = false
    try {
      val rs = ResultMaterializer.materialize(df, resultRoot, queryId)
      // The event lands in milliseconds when it lands at all — but if
      // the listener match never fires (a Spark upgrade routing the
      // write through another command class), the Complete transition
      // must not stall behind a long await: wait briefly on the serving
      // path, then hand the remaining window to a detached daemon that
      // attaches metrics late (metrics are advisory; status is not).
      if (latch.await(250, java.util.concurrent.TimeUnit.MILLISECONDS))
        attach()
      else {
        detached = true
        val t = new Thread(() => {
          try {
            if (latch.await(10, java.util.concurrent.TimeUnit.SECONDS))
              attach()
          } finally spark.listenerManager.unregister(listener)
        }, s"graft-metrics-late-$queryId")
        t.setDaemon(true)
        t.start()
      }
      rs
    } finally if (!detached) spark.listenerManager.unregister(listener)
  }

  /** Accept a query, return its id immediately (the RunQuery path).
    * `incremental=true` materializes through
    * [[ResultMaterializer.materializeIncremental]], committing rec_N files
    * as partitions finish — [[resultsSoFar]] then serves pages while the
    * query is still Running (the reference's serve-while-materializing).
    *
    * `schedulerPool` routes the query's jobs to a named scheduler pool
    * via the thread-local `spark.scheduler.pool` property — the
    * multi-tenant fairness surface: with the context running
    * `spark.scheduler.mode=FAIR`, concurrent queries in different pools
    * share executor slots by pool weight instead of FIFO-starving each
    * other (the driver-at-scale posture the reference's compute-claiming
    * scheduler gestures at, query_handler.rs:381-416). Under the default
    * FIFO mode the property is accepted and inert. Job group and pool
    * are both thread-local, so concurrent submits never bleed into each
    * other; both are cleared before the worker thread is reused.
    */
  def submit(sql: String, incremental: Boolean = false,
             schedulerPool: Option[String] = None,
             rowsPerFile: Int = 65536): String = {
    val queryId = UUID.randomUUID().toString
    states.put(queryId, Queued)
    pool.submit(new Runnable {
      override def run(): Unit = {
        // atomic Queued->Running: a cancel that landed while still queued
        // must win — the query never starts
        if (!states.replace(queryId, Queued, Running)) {
          states.replace(queryId, SentShutdown, Error("cancelled"))
          return
        }
        try {
          spark.sparkContext.setJobGroup(queryId,
            s"graft query $queryId", interruptOnCancel = true)
          schedulerPool.foreach(p =>
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", p))
          val df = graft.sql.QueryFacade.run(spark, sql)
          val t0 = System.nanoTime()
          val rs =
            if (incremental) {
              partials.put(queryId, Vector.empty)
              val r = ResultMaterializer.materializeIncremental(df,
                resultRoot, queryId, rowsPerFile = rowsPerFile, onFile =
                  rf => partials.compute(queryId, (_, v) =>
                    (if (v == null) Vector.empty else v) :+ rf))
              // the incremental path drives df's OWN plan
              // (toLocalIterator), so its executed metrics are exact
              metricsMap.put(queryId, QueryMetrics.summarize(
                df.queryExecution, System.nanoTime() - t0))
              r
            } else materializeAndProfile(df, queryId)
          // a cancel that landed mid-flight must not be overwritten back
          // to Complete; resolve it to the terminal Error state instead
          if (!states.replace(queryId, Running, Complete(rs)))
            states.replace(queryId, SentShutdown, Error("cancelled"))
          ()
        } catch {
          case e: Throwable =>
            states.put(queryId, Error(Option(e.getMessage).getOrElse(
              e.getClass.getSimpleName)))
        } finally {
          spark.sparkContext.clearJobGroup()
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
        }
      }
    })
    queryId
  }

  /** Current status (GetQueryStatus): QueryNotFound for unknown ids. */
  def status(queryId: String): QueryStatus =
    states.getOrDefault(queryId, QueryNotFound)

  /** Request cancellation (the reference's shutdown path). Transitions
    * are compare-and-swap so a cancel racing completion can never clobber
    * a terminal Complete/Error back to non-terminal SentShutdown.
    */
  def cancel(queryId: String): QueryStatus = {
    if (states.replace(queryId, Queued, SentShutdown) ||
        states.replace(queryId, Running, SentShutdown)) {
      spark.sparkContext.cancelJobGroup(queryId)
      SentShutdown
    } else status(queryId)
  }

  /** Drop a finished query's bookkeeping (and optionally its result files)
    * — a long-lived server calls this after the client is done paging, or
    * the states/partials maps grow with every query ever submitted.
    */
  def forget(queryId: String, deleteFiles: Boolean = false): Unit = {
    val prev = states.get(queryId)
    if (prev != null && prev.terminal) {
      states.remove(queryId)
      partials.remove(queryId)
      metricsMap.remove(queryId)
      // the result dir is resultRoot/<id> for EVERY query — cancelled and
      // errored ones may have partial materialization on disk too, and
      // temp subdirs require a recursive delete
      if (deleteFiles)
        ResultMaterializer.deleteTree(
          java.nio.file.Paths.get(resultRoot, queryId))
    }
  }

  /** Sweep `resultRoot` for ORPHANED result directories — dirs left by a
    * crashed or abandoned JVM (this runner tracks its own queries in
    * memory, so a restart forgets every id while the files remain) or by
    * a client that never called [[forget]]. A dir is swept when its
    * query id is NOT live in this runner's state map AND its
    * last-modified time is older than `ttlMs`; live queries — including
    * Running incrementals actively committing rec_N files — are never
    * touched, and the TTL keeps a sweep racing a JUST-materialized
    * result from a concurrent runner sharing the root. `maxDeletes`
    * bounds one sweep's work so a periodic caller has a predictable
    * cost; remaining orphans go next round. Returns the removed ids.
    *
    * A long-lived server posture calls this on a timer; it is the
    * result-dir lifecycle policy [[forget]] alone cannot provide (a
    * crashed query never gets forgotten by anyone).
    */
  def sweepOrphans(ttlMs: Long, maxDeletes: Int = 1000): Seq[String] = {
    val root = java.nio.file.Paths.get(resultRoot)
    if (!java.nio.file.Files.isDirectory(root)) return Seq.empty
    val cutoff = System.currentTimeMillis() - ttlMs
    val removed = Vector.newBuilder[String]
    var n = 0
    val stream = java.nio.file.Files.list(root)
    try {
      val it = stream.iterator()
      while (it.hasNext && n < maxDeletes) {
        val p = it.next()
        val id = p.getFileName.toString
        if (java.nio.file.Files.isDirectory(p) && !states.containsKey(id) &&
            java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff) {
          ResultMaterializer.deleteTree(p)
          removed += id
          n += 1
        }
      }
    } finally stream.close()
    removed.result()
  }

  /** Poll until terminal or deadline (wait_for_query_to_finish). Returns
    * the last observed status — non-terminal iff the deadline expired.
    */
  def waitForFinish(queryId: String, maxWaitMs: Long = 60000L,
                    pollMs: Long = 20L): QueryStatus = {
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var s = status(queryId)
    while (!s.terminal && System.nanoTime() < deadline) {
      Thread.sleep(pollMs)
      s = status(queryId)
    }
    s
  }

  /** Cursor pager over a completed query's materialized result. */
  def results(queryId: String): CursorPager = status(queryId) match {
    case Complete(rs) => new CursorPager(spark, rs)
    case s => throw new IllegalStateException(
      s"query $queryId not complete: $s")
  }

  /** Pager over the rec_N files an INCREMENTAL query has committed so far
    * — usable while the query is still Running; each call re-snapshots.
    * Files are append-only and commits atomic, so cursors from an earlier
    * snapshot stay valid in later ones.
    */
  def resultsSoFar(queryId: String): Option[CursorPager] = {
    val files = partials.get(queryId)
    if (files == null) status(queryId) match {
      case Complete(rs) => Some(new CursorPager(spark, rs))
      case _ => None
    }
    else Some(new CursorPager(spark,
      ResultMaterializer.ResultSet(
        java.nio.file.Paths.get(resultRoot, queryId).toString, files)))
  }
}

object AsyncQueryRunner {
  /** The reference's Status (query_handler_state.rs:28-60), Spark-mapped. */
  sealed trait QueryStatus {
    def terminal: Boolean = this match {
      case Complete(_) | Error(_) | QueryNotFound => true
      case _ => false
    }
  }
  case object Queued extends QueryStatus
  case object Running extends QueryStatus
  case object SentShutdown extends QueryStatus
  final case class Complete(rs: ResultMaterializer.ResultSet)
    extends QueryStatus
  final case class Error(message: String) extends QueryStatus
  case object QueryNotFound extends QueryStatus

  /** Mid-flight commit progress of an incremental query (monotone). */
  final case class Progress(filesCommitted: Long, rowsCommitted: Long)
}
