package graft.wire

import java.io.{ByteArrayInputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, Socket}

import graft.exec.CursorPager.Cursor

/** Socket client speaking the reference's async-query contract
  * (async_query_client.rs:40-202): every request opens a fresh
  * connection, performs the Identify handshake, sends one message, and
  * expects exactly one reply carrying the SAME request_id — anything
  * else is a protocol error, exactly like the Rust client's
  * `ReceivedMessageWithIncorrectRequestId`.
  *
  * This is a real wire client, not a shim over the runner: everything it
  * returns is decoded from the envelope bytes alone — the spec drives it
  * against [[GraftWireServer]] to prove both ends of the contract.
  */
final class GraftWireClient(port: Int) {
  import Wire.Name
  import GraftWireClient._

  def runQuery(sql: String): Option[BigInt] = withConn { (in, out) =>
    val body = Json.obj()
    body.set[com.fasterxml.jackson.databind.JsonNode](
      "query", Json.text(sql))
    val resp = request(in, out, Name.RunQuery, Json.bytes(body))
    require(resp.msgNameId == Name.RunQueryResp,
      s"expected RunQueryResp, got ${resp.msgNameId}")
    val n = Json.parse(resp.msgData)
    if (n.isTextual) None // "NotCreated"
    else Some(Json.bigOf(n.get("Created").get("query_id")))
  }

  /** Status in the reference's vocabulary: "Queued" | "Running" |
    * "SentShutdown" | "Complete" | "Error(<msg>)" | "QueryNotFound".
    */
  def getQueryStatus(queryId: BigInt): String = withConn { (in, out) =>
    val resp = request(in, out, Name.GetQueryStatus, queryIdBody(queryId))
    require(resp.msgNameId == Name.GetQueryStatusResp,
      s"expected GetQueryStatusResp, got ${resp.msgNameId}")
    val n = Json.parse(resp.msgData)
    if (n.isTextual) n.asText() // QueryNotFound
    else {
      val s = n.get("Status")
      if (s.isTextual) s.asText()
      else if (s.has("Error")) s"Error(${s.get("Error").asText()})"
      else if (s.has("SentShutdown")) "SentShutdown"
      else s.toString
    }
  }

  def waitForFinish(queryId: BigInt, maxWaitMs: Long = 60000L,
                    pollMs: Long = 25L): String = {
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var s = getQueryStatus(queryId)
    while (!Set("Complete", "QueryNotFound").contains(s) &&
        !s.startsWith("Error") && System.nanoTime() < deadline) {
      Thread.sleep(pollMs)
      s = getQueryStatus(queryId)
    }
    s
  }

  def cancel(queryId: BigInt): String = withConn { (in, out) =>
    val resp = request(in, out, Name.OperatorShutdown, queryIdBody(queryId))
    require(resp.msgNameId == Name.CommonGenericResponse)
    Json.parse(resp.msgData).asText()
  }

  /** Execution-cost summary of a finished query, decoded from the
    * graft-only GetQueryMetricsResp wire bytes alone (the status body
    * itself is an externally-tagged serde enum and cannot carry sibling
    * fields, so metrics ride their own message); None while metrics
    * don't exist yet, for unknown ids, or against a plain reference
    * server (which answers the unknown message id generically).
    */
  def getQueryMetrics(queryId: BigInt)
      : Option[graft.exec.QueryMetrics.Summary] = withConn { (in, out) =>
    val resp = request(in, out, Name.GetQueryMetrics, queryIdBody(queryId))
    if (resp.msgNameId != Name.GetQueryMetricsResp) None // reference server
    else {
      val n = Json.parse(resp.msgData)
      if (n.isTextual || !n.has("Metrics")) None
      else {
        val m = n.get("Metrics")
        Some(graft.exec.QueryMetrics.Summary(
          durationMs = m.get("duration_ms").asLong(),
          scanRows = m.get("scan_rows").asLong(),
          filesRead = m.get("files_read").asLong(),
          shuffleRecordsWritten = m.get("shuffle_records").asLong(),
          shuffleBytesWritten = m.get("shuffle_bytes").asLong()))
      }
    }
  }

  /** Commit progress of a RUNNING incremental query — (files committed,
    * rows committed), monotonically growing across polls; None once the
    * terminal summary replaces it, for non-incremental queries, or for
    * unknown ids.
    */
  def getQueryProgress(queryId: BigInt): Option[(Long, Long)] =
    withConn { (in, out) =>
      val resp = request(in, out, Name.GetQueryMetrics, queryIdBody(queryId))
      if (resp.msgNameId != Name.GetQueryMetricsResp) None
      else {
        val n = Json.parse(resp.msgData)
        if (n.isTextual || !n.has("Progress")) None
        else {
          val p = n.get("Progress")
          Some((p.get("files_committed").asLong(),
            p.get("rows_committed").asLong()))
        }
      }
    }

  def getQueryData(queryId: BigInt, cursor: Cursor, limit: Int,
                   forward: Boolean, allowOverflow: Boolean): DataResp =
    withConn { (in, out) =>
      val b = Json.obj()
      import com.fasterxml.jackson.databind.JsonNode
      // Backward sentinels must ride the wire as EXACTLY u64::MAX — the
      // reference server compares == std::u64::MAX
      // (query_data_handler.rs:216,305-308), so emitting our in-memory
      // Int.MaxValue/Long.MaxValue maxes would make a real reference
      // server look up literal row group 2147483647 and miss at every
      // boundary. The JSON body carries BigInt, so the full u64 fits.
      val rgWire: BigInt =
        if (cursor.rowGroup == Int.MaxValue) U64Max
        else BigInt(cursor.rowGroup)
      val rowWire: BigInt =
        if (cursor.row == Long.MaxValue) U64Max else BigInt(cursor.row)
      b.set[JsonNode]("query_id", Json.big(queryId))
      b.set[JsonNode]("file_idx", Json.long(cursor.file.toLong))
      b.set[JsonNode]("file_row_group_idx", Json.big(rgWire))
      b.set[JsonNode]("row_idx", Json.big(rowWire))
      b.set[JsonNode]("limit", Json.long(limit.toLong))
      b.set[JsonNode]("forward", Json.bool(forward))
      b.set[JsonNode]("allow_overflow", Json.bool(allowOverflow))
      val resp = request(in, out, Name.GetQueryData, Json.bytes(b))
      require(resp.msgNameId == Name.GetQueryDataResp,
        s"expected GetQueryDataResp, got ${resp.msgNameId}")
      decodeDataResp(resp.msgData)
    }

  /** GetQueryDataResp body decode (query.rs:161-255): u8 variant, u64
    * meta length, meta JSON; variant 2 is followed by the Arrow IPC
    * stream, which must contain EXACTLY one record batch
    * (GetQueryDataRespParser::parse_record).
    */
  private def decodeDataResp(data: Array[Byte]): DataResp = {
    val in = new DataInputStream(new ByteArrayInputStream(data))
    val variant = in.readByte() & 0xff
    val metaLen = in.readLong().toInt
    val meta = new Array[Byte](metaLen)
    in.readFully(meta)
    variant match {
      case 0 => DataQueryNotFound
      case 1 => DataRowGroupNotFound
      case 4 => DataEndOfFiles
      case 3 =>
        DataError(Json.parse(meta).get("Error").get("err").asText())
      case 2 =>
        val m = Json.parse(meta).get("Record")
        def cur(n: com.fasterxml.jackson.databind.JsonNode): Cursor =
          Cursor(n.get(0).asInt(), n.get(1).asInt(), n.get(2).asLong())
        val offsets = (0 until m.get("record_offsets").size())
          .map(i => cur(m.get("record_offsets").get(i)))
        val first = cur(m.get("first_offset"))
        val arrowBytes = in.readAllBytes()
        DataRecord(decodeArrow(arrowBytes), offsets, first)
      case v => throw new IllegalStateException(s"unknown variant $v")
    }
  }

  /** Decode an Arrow IPC stream into row-major values via the plain
    * Arrow Java reader — no Spark involvement, proving the page is
    * consumable by any Arrow client as the reference intends.
    */
  private def decodeArrow(bytes: Array[Byte]): Seq[Seq[Any]] = {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val rdr = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new ByteArrayInputStream(bytes), alloc)
    try {
      require(rdr.loadNextBatch(), "empty Arrow stream in Record response")
      val root = rdr.getVectorSchemaRoot
      val cols = root.getFieldVectors
      val rows = (0 until root.getRowCount).map { i =>
        (0 until cols.size()).map { c =>
          val v = cols.get(c).getObject(i)
          v match {
            case t: org.apache.arrow.vector.util.Text => t.toString
            case other => other
          }
        }
      }
      require(!rdr.loadNextBatch(), "expected exactly one batch per page")
      rows
    } finally { rdr.close(); alloc.close() }
  }

  private def queryIdBody(queryId: BigInt): Array[Byte] = {
    val b = Json.obj()
    b.set[com.fasterxml.jackson.databind.JsonNode](
      "query_id", Json.big(queryId))
    Json.bytes(b)
  }

  /** Connect → Identify handshake → run one request → close, the
    * reference client's per-call lifecycle (create_connection,
    * async_query_client.rs:174-202).
    */
  private def withConn[T](f: (DataInputStream, DataOutputStream) => T): T = {
    val sock = new Socket(InetAddress.getLoopbackAddress, port)
    try {
      val in = new DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(
        new java.io.BufferedOutputStream(sock.getOutputStream))
      val connectionId = Wire.randomU128()
      val ident = request(in, out, Name.Identify,
        Json.identify("Connection", connectionId),
        connectionId = Some(connectionId))
      require(ident.msgNameId == Name.Identify &&
        Json.parse(ident.msgData).has("Worker"),
        "expected Identify::Worker handshake reply")
      f(in, out)
    } finally sock.close()
  }

  /** Send one envelope, block for the reply, enforce request-id echo. */
  private def request(in: DataInputStream, out: DataOutputStream,
                      nameId: Int, body: Array[Byte],
                      connectionId: Option[BigInt] = None): Envelope = {
    val env = Envelope(msgNameId = nameId, msgId = Wire.randomU128(),
      requestId = Wire.randomU128(),
      sentFromConnectionId = connectionId, msgData = body)
    Wire.write(out, env)
    val resp = Wire.read(in).getOrElse(
      throw new IllegalStateException("expected message but received none"))
    require(resp.requestId == env.requestId,
      "received message with incorrect request id")
    resp
  }
}

object GraftWireClient {
  sealed trait DataResp
  case object DataQueryNotFound extends DataResp
  case object DataRowGroupNotFound extends DataResp
  case object DataEndOfFiles extends DataResp
  final case class DataError(err: String) extends DataResp
  /** A decoded Record page: rows come straight out of the Arrow IPC
    * stream bytes (one column-major batch), offsets from the meta JSON.
    */
  final case class DataRecord(rows: Seq[Seq[Any]], offsets: Seq[Cursor],
                              firstOffset: Cursor) extends DataResp

  /** The reference iterator's next-cursor derivation
    * (query_data_iterator.rs:117-141) — all a client has is the returned
    * offsets; it cannot know row-group sizes:
    *
    *  - forward: last offset's row + 1 (the server rolls the overflow
    *    into the next group/file, and answers ReachedEndOfFiles one past
    *    the global end);
    *  - backward: decrement the FIRST offset, using max-value sentinels
    *    for "last group of the previous file" / "last row of the
    *    previous group" exactly like the Rust client's u64::MAX. The
    *    in-memory Cursor carries Int.MaxValue/Long.MaxValue as the
    *    sentinel values; [[GraftWireClient.getQueryData]] re-encodes
    *    them as the literal 2^64-1 on the wire, so a strict reference
    *    server's `== u64::MAX` checks match. (0,0,0) is the natural
    *    start: no previous page.
    */
  val U64Max: BigInt = (BigInt(1) << 64) - 1

  def nextForward(offsets: Seq[Cursor]): Option[Cursor] =
    offsets.lastOption.map(l => Cursor(l.file, l.rowGroup, l.row + 1))

  def nextBackward(offsets: Seq[Cursor]): Option[Cursor] =
    offsets.headOption.flatMap { f =>
      if (f.file == 0 && f.rowGroup == 0 && f.row == 0L) None
      else if (f.rowGroup == 0 && f.row == 0L)
        Some(Cursor(f.file - 1, Int.MaxValue, Long.MaxValue))
      else if (f.row == 0L)
        Some(Cursor(f.file, f.rowGroup - 1, Long.MaxValue))
      else Some(Cursor(f.file, f.rowGroup, f.row - 1))
    }
}
