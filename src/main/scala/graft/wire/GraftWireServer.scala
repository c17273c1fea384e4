package graft.wire

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}

import com.fasterxml.jackson.databind.JsonNode

import graft.exec.{AsyncQueryRunner, CursorPager}
import graft.exec.AsyncQueryRunner._
import graft.exec.CursorPager.Cursor

/** Loopback TCP server speaking the reference's client wire contract —
  * the last piece of its application surface: the socket lifecycle the
  * Rust `AsyncQueryClient` drives (async_query_client.rs:40-202) over
  * the [[Wire]] envelope (messages/message.rs:95-129).
  *
  * Request handling (each reply echoes request_id and routes to the
  * sender, message_router_handler.rs:287-306):
  *
  *  - `Identify::Connection{id}` → reply `Identify::Worker{id}`
  *    (the handshake every reference client connection opens with).
  *  - `Ping::Ping` → `Ping::Pong` (common.rs:28-31).
  *  - `RunQuery{query}` → submit to [[AsyncQueryRunner]], reply
  *    `RunQueryResp::Created{query_id}` (query.rs:353-397); a rejected
  *    submission replies `NotCreated`.
  *  - `GetQueryStatus{query_id}` → `GetQueryStatusResp`: `QueryNotFound`
  *    or `Status(...)` in the reference's vocabulary
  *    (query_handler_state.rs:28-60).
  *  - `GetQueryData{query_id, file_idx, file_row_group_idx, row_idx,
  *    limit, forward, allow_overflow}` → `GetQueryDataResp`, the one
  *    message with a custom binary body (query.rs:60-94): `u8` variant
  *    id, `u64` meta-JSON length, the serde meta JSON, then — for
  *    `Record` — the page as one self-contained Arrow IPC stream
  *    (schema + single batch + EOS), produced by
  *    [[CursorPager.pageArrow]]. `record_offsets`/`first_offset` carry
  *    the per-row (file, row_group, row) cursors.
  *  - `OperatorShutdown{query_id}` → cancel. The reference DECLARES this
  *    message name (message.rs:554,619: id 12) but ships no payload
  *    struct for it; completed here as `{"query_id":N}` with a
  *    `CommonGenericResponse::Ok` reply (common.rs:47-50) — the
  *    client-facing cancel the reference's TUI lacks.
  *
  * Scale/serving posture: one daemon thread per connection (the
  * reference client opens a connection PER REQUEST and closes it, so
  * connections are short-lived and the thread count tracks in-flight
  * requests, not clients); all query execution stays on the runner's
  * pool — the socket thread only pages already-materialized results, so
  * a slow client cannot hold a Spark job thread hostage.
  */
final class GraftWireServer(runner: AsyncQueryRunner,
                            incremental: Boolean = false,
                            incrementalRowsPerFile: Int = 65536) {
  import Wire.Name

  /** This worker's identity, sent in Identify replies. */
  val workerId: BigInt = Wire.randomU128()

  @volatile private var server: ServerSocket = _
  @volatile private var closed = false

  def port: Int = server.getLocalPort

  /** Bind a loopback ephemeral port and start the accept loop. */
  def start(): GraftWireServer = {
    server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
    val t = new Thread(() => acceptLoop(), "graft-wire-accept")
    t.setDaemon(true)
    t.start()
    this
  }

  def stop(): Unit = {
    closed = true
    if (server != null) server.close()
  }

  private def acceptLoop(): Unit = {
    // a transient accept failure (fd exhaustion under connection churn)
    // must not kill the accept loop while the socket is still bound —
    // but a PERSISTENT fault must not spin it at 100 Hz forever either:
    // consecutive failures back off exponentially (10 ms → ~5 s cap) and
    // a run of 100 with no successful accept in between poisons the
    // server (the fault clearly isn't clearing; better to stop serving
    // than to burn a core). A successful accept resets both.
    var consecutiveFailures = 0
    while (!closed) {
      try {
        val sock = server.accept()
        consecutiveFailures = 0
        val t = new Thread(() => serve(sock), "graft-wire-conn")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: Throwable if closed => return
        case scala.util.control.NonFatal(_) =>
          consecutiveFailures += 1
          if (consecutiveFailures >= 100) { stop(); return }
          Thread.sleep(math.min(10L << math.min(consecutiveFailures, 9), 5000L))
      }
    }
  }

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream))
    try {
      var done = false
      while (!done) Wire.read(in) match {
        case None => done = true // clean close from the peer
        case Some(env) =>
          // a malformed body or a handler fault must answer THIS request
          // (the client blocks on its request_id), not kill the
          // connection silently
          val resp =
            try handle(env)
            catch {
              case scala.util.control.NonFatal(e) => Some(faultReply(env, e))
            }
          // every reply carries this worker's identity — stamped HERE so
          // no handler branch can forget it
          resp.foreach(r =>
            Wire.write(out, r.copy(sentFromWorkerId = Some(workerId))))
      }
    } catch {
      case _: java.io.IOException => () // peer reset mid-frame
      case scala.util.control.NonFatal(_) => () // unparseable frame: the
      // next frame boundary is unknowable, so the connection is dropped
      // (the reference client treats a closed socket as the error signal)
    } finally sock.close()
  }

  private def handle(env: Envelope): Option[Envelope] = env.msgNameId match {
    case Name.Identify =>
      val n = Json.parse(env.msgData)
      val connId = Option(n.get("Connection")).map(c => Json.bigOf(c.get("id")))
      Some(env.reply(Name.Identify, Json.identify("Worker", workerId))
        .copy(routeToConnectionId = connId))

    case Name.Ping =>
      Some(env.reply(Name.Ping, Json.bytes(Json.text("Pong"))))

    case Name.RunQuery =>
      val sql = Json.parse(env.msgData).get("query").asText()
      val body =
        try {
          val qid = runner.submit(sql, incremental = incremental,
            rowsPerFile = incrementalRowsPerFile)
          val inner = Json.obj()
          inner.set[JsonNode]("query_id", Json.big(Wire.uuidToU128(qid)))
          val o = Json.obj(); o.set[JsonNode]("Created", inner)
          Json.bytes(o)
        } catch {
          case scala.util.control.NonFatal(_) =>
            Json.bytes(Json.text("NotCreated"))
        }
      Some(env.reply(Name.RunQueryResp, body))

    case Name.GetQueryStatus =>
      val qid = queryId(env.msgData)
      val body = runner.status(qid) match {
        case QueryNotFound => Json.bytes(Json.text("QueryNotFound"))
        case s =>
          val statusNode: JsonNode = s match {
            case Queued => Json.text("Queued")
            case Running => Json.text("Running")
            case SentShutdown =>
              // serde tuple variant: {"SentShutdown": <timestamp>}
              val o = Json.obj()
              o.set[JsonNode]("SentShutdown",
                Json.text(java.time.Instant.now().toString))
              o
            case Complete(_) => Json.text("Complete")
            case Error(m) =>
              val o = Json.obj(); o.set[JsonNode]("Error", Json.text(m)); o
            case QueryNotFound => Json.text("Queued") // unreachable
          }
          // The body is EXACTLY the reference's externally-tagged enum —
          // one key, nothing else: serde_json's deserialize_enum for
          // GetQueryStatusResp (query.rs:308) requires a single-key map,
          // so a sibling field would fail every reference client's
          // Complete decode. Metrics travel on the graft-only
          // GetQueryMetrics message instead.
          val o = Json.obj(); o.set[JsonNode]("Status", statusNode)
          Json.bytes(o)
      }
      Some(env.reply(Name.GetQueryStatusResp, body))

    case Name.GetQueryMetrics =>
      // Graft-only introspection (id outside the reference space, so
      // GetQueryStatusResp stays byte-compatible): the query's
      // execution-cost summary once terminal metrics exist, else —
      // for a Running incremental query — its commit progress so far
      // (files + rows committed, monotonically growing), so a client
      // paging a minutes-long incremental query is never flying blind.
      val qid = queryId(env.msgData)
      val body = runner.status(qid) match {
        case QueryNotFound => Json.bytes(Json.text("QueryNotFound"))
        case _ =>
          runner.metrics(qid) match {
            case Some(m) =>
              val mo = Json.obj()
              mo.set[JsonNode]("duration_ms", Json.long(m.durationMs))
              mo.set[JsonNode]("scan_rows", Json.long(m.scanRows))
              mo.set[JsonNode]("files_read", Json.long(m.filesRead))
              mo.set[JsonNode]("shuffle_records",
                Json.long(m.shuffleRecordsWritten))
              mo.set[JsonNode]("shuffle_bytes",
                Json.long(m.shuffleBytesWritten))
              val o = Json.obj(); o.set[JsonNode]("Metrics", mo)
              Json.bytes(o)
            case None => runner.progress(qid) match {
              case Some(p) =>
                val po = Json.obj()
                po.set[JsonNode]("files_committed",
                  Json.long(p.filesCommitted))
                po.set[JsonNode]("rows_committed",
                  Json.long(p.rowsCommitted))
                val o = Json.obj(); o.set[JsonNode]("Progress", po)
                Json.bytes(o)
              case None => Json.bytes(Json.text("NoMetrics"))
            }
          }
      }
      Some(env.reply(Name.GetQueryMetricsResp, body))

    case Name.OperatorShutdown =>
      runner.cancel(queryId(env.msgData))
      Some(env.reply(Name.CommonGenericResponse,
        Json.bytes(Json.text("Ok"))))

    case Name.GetQueryData =>
      val n = Json.parse(env.msgData)
      val qid = Wire.u128ToUuid(Json.bigOf(n.get("query_id")))
      // cursor fields parse through BigInt and clamp at Long: the
      // reference iterator sends u64::MAX sentinels on backward pages
      // ("last group of the file" / "last row of the group",
      // query_data_iterator.rs:129-140) which must survive the decode
      def asClampedLong(field: String): Long = {
        val v = Json.bigOf(n.get(field))
        if (v > Long.MaxValue) Long.MaxValue else v.toLong
      }
      val file = asClampedLong("file_idx")
      val rowGroup = asClampedLong("file_row_group_idx")
      val row = asClampedLong("row_idx")
      // limit is u64 on the wire too: asInt() would wrap a value above
      // Int.MaxValue to zero/negative and silently serve an empty page —
      // clamp like the cursor fields instead
      val limit = {
        val v = Json.bigOf(n.get("limit"))
        if (v > Int.MaxValue) Int.MaxValue else v.toInt
      }
      val forward = n.get("forward").asBoolean()
      val allowOverflow = n.get("allow_overflow").asBoolean()
      // limit == 0 ends the page walk gracefully, matching the reference
      // exactly: its handler returns Ok(None) for a zero remaining limit
      // (query_data_handler.rs:255) which the client surfaces as
      // ReachedEndOfFiles — a pagination loop that legitimately computes
      // zero remaining rows must terminate, not error. A NEGATIVE value
      // cannot arise from a u64 wire field, so it is garbage input and
      // stays the typed Error.
      if (limit == 0)
        return Some(env.reply(Name.GetQueryDataResp,
          dataResp(4, Json.bytes(Json.text("ReachedEndOfFiles")))))
      if (limit < 0)
        return Some(env.reply(Name.GetQueryDataResp,
          dataResp(3, errMeta(s"limit must be non-negative, got $limit"))))
      val body = runner.status(qid) match {
        case QueryNotFound =>
          pagers.synchronized(pagers.remove(qid)) // forgotten: drop pager
          dataResp(0, Json.bytes(Json.text("QueryNotFound")))
        case st @ (Complete(_) | Running | Queued | SentShutdown) =>
          // ReachedEndOfFiles is the iterator's TERMINAL signal — only a
          // COMPLETE query may send it. A cursor one past the committed
          // end of a still-running incremental query is a retryable
          // RecordRowGroupNotFound (the row isn't there YET): answering
          // end-of-files would make a live-paging client stop for good
          // and silently truncate the result.
          val endVariant =
            if (st.isInstanceOf[Complete])
              dataResp(4, Json.bytes(Json.text("ReachedEndOfFiles")))
            else
              dataResp(1, Json.bytes(Json.text("RecordRowGroupNotFound")))
          pagerFor(qid) match {
            case None =>
              dataResp(3, errMeta(s"query $qid has no pageable results yet"))
            case Some(pager) =>
              pager.resolveClientCursor(file, rowGroup, row, forward) match {
                case Left(CursorPager.CursorMiss.PastEnd) => endVariant
                case Left(CursorPager.CursorMiss.NotFound) =>
                  dataResp(1, Json.bytes(Json.text("RecordRowGroupNotFound")))
                case Right(cursor) =>
                  val p = pager.pageArrow(cursor, limit, forward,
                    allowOverflow)
                  if (p.offsets.isEmpty) endVariant
                  else dataResp(2, recordMeta(p.offsets), p.ipc)
              }
          }
        case Error(m) => dataResp(3, errMeta(m))
      }
      Some(env.reply(Name.GetQueryDataResp, body))

    case other =>
      Some(env.reply(Name.CommonGenericResponse, {
        val o = Json.obj()
        o.set[JsonNode]("Error", Json.text(s"unhandled message id $other"))
        Json.bytes(o)
      }))
  }

  /** A handler fault (malformed body, runner error) must answer in the
    * REQUEST'S OWN response vocabulary: a reference client blocked in
    * `expect_msg::<GetQueryDataResp>` fails the message cast on a
    * CommonGenericResponse instead of seeing the protocol's typed Error
    * variant. Messages without a typed error fall back to the generic
    * response.
    */
  private def faultReply(env: Envelope, e: Throwable): Envelope = {
    val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
    env.msgNameId match {
      case Name.GetQueryData =>
        env.reply(Name.GetQueryDataResp, dataResp(3, errMeta(msg)))
      case Name.GetQueryStatus =>
        // GetQueryStatusResp::Status(Error(msg)) — the typed error shape
        val err = Json.obj(); err.set[JsonNode]("Error", Json.text(msg))
        val o = Json.obj(); o.set[JsonNode]("Status", err)
        env.reply(Name.GetQueryStatusResp, Json.bytes(o))
      case Name.RunQuery =>
        env.reply(Name.RunQueryResp, Json.bytes(Json.text("NotCreated")))
      case _ =>
        val o = Json.obj()
        o.set[JsonNode]("Error", Json.text(msg))
        env.reply(Name.CommonGenericResponse, Json.bytes(o))
    }
  }

  private def queryId(data: Array[Byte]): String =
    Wire.u128ToUuid(Json.bigOf(Json.parse(data).get("query_id")))

  // One pager per COMPLETED query, reused across page requests: the
  // pager compiles its Arrow encoder and reads the result schema once,
  // so rebuilding it per GetQueryData would pay encoder codegen on
  // every page — the cost the pager's own design hoists out. The map is
  // a size-bounded LRU (each pager holds up to 8 row groups of
  // materialized Rows — a long-lived server with thousands of forgotten
  // queries would otherwise accumulate them, since nothing external can
  // reach this cache to evict); a re-requested evicted query just
  // rebuilds its pager.
  private val MaxCachedPagers = 64
  private val pagers =
    new java.util.LinkedHashMap[String, CursorPager](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, CursorPager]): Boolean =
        size() > MaxCachedPagers
    }

  /** Completed results page through [[AsyncQueryRunner.results]] (cached
    * per query); a still-running incremental query pages what it has
    * committed so far — re-snapshotted per request, since its file set
    * grows with every commit.
    */
  private def pagerFor(qid: String): Option[CursorPager] =
    runner.status(qid) match {
      case Complete(_) => pagers.synchronized {
        val cached = pagers.get(qid)
        if (cached != null) Some(cached)
        else {
          val p = runner.results(qid)
          pagers.put(qid, p)
          Some(p)
        }
      }
      case _ =>
        pagers.synchronized(pagers.remove(qid)) // never serve stale
        runner.resultsSoFar(qid)
    }

  /** GetQueryDataResp body (query.rs:61-94): u8 variant, u64 meta len,
    * meta JSON, then (Record only) the Arrow IPC stream.
    */
  private def dataResp(variant: Int, meta: Array[Byte],
                       arrow: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val out = new ByteArrayOutputStream(1 + 8 + meta.length + arrow.length)
    val d = new DataOutputStream(out)
    d.writeByte(variant)
    d.writeLong(meta.length.toLong)
    d.write(meta)
    d.write(arrow)
    d.flush()
    out.toByteArray
  }

  /** `{"Record":{"record_offsets":[[f,rg,r]...],"first_offset":[f,rg,r]}}`
    * — serde's JSON for the Record variant with the batch skipped
    * (query.rs:22-35: `#[serde(skip_serializing)] record`).
    */
  private def recordMeta(offsets: Seq[Cursor]): Array[Byte] = {
    val f = Json.obj()
    val arr = f.putArray("record_offsets")
    offsets.foreach { c =>
      val t = arr.addArray()
      t.add(c.file.toLong); t.add(c.rowGroup.toLong); t.add(c.row)
    }
    val first = f.putArray("first_offset")
    first.add(offsets.head.file.toLong)
    first.add(offsets.head.rowGroup.toLong)
    first.add(offsets.head.row)
    val o = Json.obj(); o.set[JsonNode]("Record", f)
    Json.bytes(o)
  }

  private def errMeta(msg: String): Array[Byte] = {
    val inner = Json.obj(); inner.set[JsonNode]("err", Json.text(msg))
    val o = Json.obj(); o.set[JsonNode]("Error", inner)
    Json.bytes(o)
  }
}
