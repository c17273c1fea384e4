package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.AsyncQueryRunner
import graft.exec.CursorPager.Cursor
import graft.wire._
import graft.wire.GraftWireClient._

/** The loopback wire protocol: a REAL socket client (GraftWireClient,
  * the reference async_query_client.rs contract — fresh connection +
  * Identify handshake per request, reply matched by request_id) driving
  * GraftWireServer through submit → poll → page forward/backward →
  * cancel, with every page decoded from the envelope bytes alone.
  */
class WireSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("envelope: byte layout matches message.rs to_bytes/parse") {
    val body = """{"query":"select 1"}""".getBytes("UTF-8")
    val connId = BigInt("240282366920938463463374607431768211455") // >2^64
    val env = Envelope(msgNameId = Wire.Name.RunQuery,
      msgId = Wire.randomU128(), requestId = Wire.randomU128(),
      sentFromConnectionId = Some(connId), msgData = body)
    val out = new ByteArrayOutputStream()
    Wire.write(new DataOutputStream(out), env)
    val bytes = out.toByteArray
    // total frame = 4 + header_len + data_len (message.rs:268)
    assert(bytes.length === 4 + 158 + body.length)
    val din = new DataInputStream(new ByteArrayInputStream(bytes))
    assert(din.readInt() === 158) // header_len (message.rs:294-296)
    assert(din.readLong() === body.length.toLong) // data_len
    assert(din.readShort() === 0) // header_version
    assert(din.readShort() === 2) // RunQuery (message.rs:609)
    din.skipNBytes(16 + 16) // msg_id, request_id
    assert((din.readByte() & 0xff) === 8) // sent_from_flags: connection bit
    din.skipNBytes(16 * 3)
    // the u128 connection id survives the 16-byte BE round trip
    val hi = din.readLong(); val lo = din.readLong()
    val decoded = ((BigInt(hi) & ((BigInt(1) << 64) - 1)) << 64) |
      (BigInt(lo) & ((BigInt(1) << 64) - 1))
    assert(decoded === connId)
    // full round trip through the parser
    val back = Wire.read(new DataInputStream(
      new ByteArrayInputStream(bytes))).get
    assert(back.msgNameId === env.msgNameId)
    assert(back.requestId === env.requestId)
    assert(back.sentFromConnectionId === Some(connId))
    assert(back.routeToWorkerId === None)
    assert(new String(back.msgData, "UTF-8") === new String(body, "UTF-8"))
  }

  test("envelope: seeded property — write∘read is identity over random " +
       "ids, flag combinations, and payloads") {
    import org.scalacheck.{Gen, rng}
    // full-range halves INCLUDING negative longs (top bit set): ids in
    // [2^63, 2^64) per half are exactly where the U64Mask sign handling
    // in writeU128/readU128 matters
    val genHalf = Gen.chooseNum(Long.MinValue, Long.MaxValue)
      .map(v => BigInt(v) & ((BigInt(1) << 64) - 1))
    val genId = genHalf.flatMap(hi => genHalf.map(lo => (hi << 64) | lo))
    val genOpt = Gen.option(genId)
    val genEnv = for {
      name <- Gen.oneOf(0, 1, 2, 3, 9, 12, 13, 14, 15, 16)
      msgId <- genId; reqId <- genId
      sfw <- genOpt; sfq <- genOpt; sfo <- genOpt; sfc <- genOpt
      rtw <- genOpt; rto <- genOpt; rtc <- genOpt
      n <- Gen.chooseNum(0, 4096)
      payload <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127)
        .map(_.toByte))
    } yield Envelope(name, msgId, reqId, sfw, sfq, sfo, sfc, rtw, rto, rtc,
      payload)
    for (i <- 0 until 80) {
      genEnv(Gen.Parameters.default, rng.Seed(i.toLong)).foreach { e =>
        val out = new ByteArrayOutputStream()
        Wire.write(new DataOutputStream(out), e)
        val bytes = out.toByteArray
        assert(bytes.length === 4 + 158 + e.msgData.length, s"seed $i")
        val b = Wire.read(new DataInputStream(
          new ByteArrayInputStream(bytes))).get
        assert(b.msgNameId === e.msgNameId, s"seed $i")
        assert(b.msgId === e.msgId && b.requestId === e.requestId, s"seed $i")
        assert(b.sentFromWorkerId === e.sentFromWorkerId &&
          b.sentFromQueryId === e.sentFromQueryId &&
          b.sentFromOperationId === e.sentFromOperationId &&
          b.sentFromConnectionId === e.sentFromConnectionId, s"seed $i")
        assert(b.routeToWorkerId === e.routeToWorkerId &&
          b.routeToOperationId === e.routeToOperationId &&
          b.routeToConnectionId === e.routeToConnectionId, s"seed $i")
        assert(java.util.Arrays.equals(b.msgData, e.msgData), s"seed $i")
        // two frames back-to-back parse independently (stream framing)
        val two = new DataInputStream(new ByteArrayInputStream(
          bytes ++ bytes))
        assert(Wire.read(two).get.msgId === e.msgId)
        assert(Wire.read(two).get.msgId === e.msgId)
        assert(Wire.read(two) === None) // clean EOF at the boundary
      }
    }
  }

  test("cursor protocol property: for random page limits, the iterator's " +
       "offset arithmetic walks a multi-file result exactly once in both " +
       "directions") {
    import graft.exec.{CursorPager, ResultMaterializer}
    import org.scalacheck.{Gen, rng}
    val tmp = java.nio.file.Files.createTempDirectory("curprop").toString
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .orderBy("o_orderkey").select("o_orderkey")
    // multi-file, multi-group layout: the walk must cross both kinds of
    // boundary through the server-side roll/clamp, not toCursor
    val rs = ResultMaterializer.materializeIncremental(df, tmp, "q-prop",
      rowsPerFile = 230)
    val pager = new CursorPager(spark, rs)
    val direct = df.collect().map(_.getLong(0)).toVector
    val genLimit = Gen.chooseNum(1, 400)
    for (i <- 0 until 25) {
      val limit = genLimit(Gen.Parameters.default, rng.Seed(i.toLong)).get
      // forward: (0,0,0) then last_offset+1 until PastEnd
      var fcur: Either[CursorPager.CursorMiss, CursorPager.Cursor] =
        pager.resolveClientCursor(0, 0, 0, forward = true)
      val fwd = Vector.newBuilder[Long]
      while (fcur.isRight) {
        val p = pager.page(fcur.toOption.get, limit)
        fwd ++= p.rows.map(_.getLong(0))
        val n = GraftWireClient.nextForward(p.offsets).get
        fcur = pager.resolveClientCursor(n.file.toLong, n.rowGroup.toLong,
          n.row, forward = true)
      }
      assert(fcur === Left(CursorPager.CursorMiss.PastEnd), s"limit $limit")
      assert(fwd.result() === direct, s"forward limit $limit")
      // backward: from the last row via sentinel decrements to (0,0,0)
      val last = pager.toCursor(pager.totalRows - 1)
      var bcur: Option[CursorPager.Cursor] = Some(last)
      val bwd = Vector.newBuilder[Long]
      while (bcur.isDefined) {
        val c = bcur.get
        val resolved = pager.resolveClientCursor(c.file.toLong,
          c.rowGroup.toLong, c.row, forward = false)
        val p = pager.page(resolved.toOption.get, limit, forward = false)
        bwd ++= p.rows.reverse.map(_.getLong(0))
        bcur = GraftWireClient.nextBackward(p.offsets)
      }
      assert(bwd.result().reverse === direct, s"backward limit $limit")
    }
  }

  test("socket lifecycle: submit -> poll -> page forward/backward -> " +
       "cancel, pages decoded from wire bytes alone") {
    val tmp = java.nio.file.Files.createTempDirectory("wire").toString
    val runner = new AsyncQueryRunner(spark, tmp)
    val server = new GraftWireServer(runner).start()
    try {
      val client = new GraftWireClient(server.port)

      // --- submit (RunQuery -> RunQueryResp::Created{query_id}) ---
      val qid = client.runQuery(
        s"select o_orderkey, o_totalprice from " +
          s"read_files('$dir/orders.parquet') order by o_orderkey").get

      // --- poll (GetQueryStatus until terminal) ---
      assert(client.waitForFinish(qid, maxWaitMs = 120000L) === "Complete")

      // --- page forward through the whole result, WIRE-ONLY: the next
      // cursor comes from the reference iterator's offset arithmetic
      // (last offset + 1 row), never from server-internal state, and the
      // walk terminates on the protocol's ReachedEndOfFiles ---
      val got = Vector.newBuilder[Long]
      var cursor = Cursor(0, 0, 0L)
      var pages = 0
      var done = false
      var lastOffset: Cursor = cursor
      while (!done) {
        client.getQueryData(qid, cursor, 137, forward = true,
          allowOverflow = false) match {
          case DataRecord(rows, offsets, firstOffset) =>
            assert(firstOffset === offsets.head)
            assert(offsets.length === rows.length)
            rows.foreach(r => got += r.head.asInstanceOf[Long])
            lastOffset = offsets.last
            pages += 1
            cursor = GraftWireClient.nextForward(offsets).get
          case DataEndOfFiles => done = true // one past the last row
          case other => fail(s"unexpected page response: $other")
        }
      }
      val direct = spark.read.parquet(s"$dir/orders.parquet")
        .orderBy("o_orderkey").collect().map(_.getLong(0)).toVector
      assert(got.result() === direct)
      assert(pages === (1500 + 136) / 137)

      // --- page backward from the last row (inclusive), wire-decoded ---
      client.getQueryData(qid, lastOffset, 100, forward = false,
        allowOverflow = false) match {
        case DataRecord(rows, _, _) =>
          assert(rows.map(_.head.asInstanceOf[Long]) === direct.takeRight(100))
        case other => fail(s"unexpected backward response: $other")
      }
      // --- full backward walk via the iterator's sentinel decrements:
      // group/row max-values must clamp server-side to "last of" ---
      val gotBack = Vector.newBuilder[Long]
      var bcur: Option[Cursor] = Some(lastOffset)
      var bpages = 0
      while (bcur.isDefined) {
        client.getQueryData(qid, bcur.get, 137, forward = false,
          allowOverflow = false) match {
          case DataRecord(rows, offsets, _) =>
            // backward pages arrive in forward order; append each page
            // reversed and un-reverse the whole walk at the end
            rows.reverse.foreach(r => gotBack += r.head.asInstanceOf[Long])
            bpages += 1
            bcur = GraftWireClient.nextBackward(offsets)
          case other => fail(s"unexpected backward-walk response: $other")
        }
      }
      assert(gotBack.result().reverse === direct)
      assert(bpages === (1500 + 136) / 137)
      // backward page clamped at row 0 tops up forward with allow_overflow
      client.getQueryData(qid, Cursor(0, 0, 2L), 50, forward = false,
        allowOverflow = true) match {
        case DataRecord(rows, _, _) =>
          assert(rows.map(_.head.asInstanceOf[Long]) === direct.take(50))
        case other => fail(s"unexpected overflow response: $other")
      }

      // --- protocol misses ---
      // forward past the file set is the iterator's clean end, not an
      // error (walking off the last file = ReachedEndOfFiles)
      client.getQueryData(qid, Cursor(99, 0, 0L), 10, forward = true,
        allowOverflow = false) match {
        case DataEndOfFiles => ()
        case other => fail(s"expected ReachedEndOfFiles, got $other")
      }
      // a structurally impossible coordinate (row group beyond the file)
      // IS the error variant
      client.getQueryData(qid, Cursor(0, 99, 0L), 10, forward = true,
        allowOverflow = false) match {
        case DataRowGroupNotFound => ()
        case other => fail(s"expected RecordRowGroupNotFound, got $other")
      }
      val ghost = Wire.randomU128()
      assert(client.getQueryStatus(ghost) === "QueryNotFound")
      assert(client.getQueryData(ghost, Cursor(0, 0, 0L), 10,
        forward = true, allowOverflow = false) === DataQueryNotFound)

      // --- a failing statement reaches Error over the wire ---
      val bad = client.runQuery(
        "select * from read_files('/nonexistent-glob')").get
      assert(client.waitForFinish(bad, maxWaitMs = 120000L)
        .startsWith("Error"))

      // --- cancel (OperatorShutdown -> CommonGenericResponse::Ok) ---
      val slow = client.runQuery(
        s"select count(*) as n from read_files('$dir/lineitem.parquet') a " +
          s"join read_files('$dir/lineitem.parquet') b " +
          "on a.l_quantity = b.l_quantity and a.l_tax = b.l_tax")
        .get
      assert(client.cancel(slow) === "Ok")
      val fin = client.waitForFinish(slow, maxWaitMs = 120000L)
      assert(fin.startsWith("Error"), s"cancelled query ended as $fin")
    } finally server.stop()
  }

  test("concurrent wire clients: parallel submits against one server " +
       "stay isolated; a malformed request gets an Error reply, not a " +
       "dead connection") {
    val tmp = java.nio.file.Files.createTempDirectory("wirecc").toString
    val runner = new AsyncQueryRunner(spark, tmp)
    val server = new GraftWireServer(runner).start()
    try {
      // 4 clients, each its own table with a distinct row count — each
      // connection is served by its own thread; results must not bleed
      val expected = Map("region" -> 5, "nation" -> 25,
        "supplier" -> 10, "customer" -> 150)
      val results = new java.util.concurrent.ConcurrentHashMap[String, Int]()
      val threads = expected.keys.map { t =>
        val th = new Thread(() => {
          val c = new GraftWireClient(server.port)
          val qid = c.runQuery(
            s"select * from read_files('$dir/$t.parquet')").get
          assert(c.waitForFinish(qid, maxWaitMs = 120000L) === "Complete")
          var cur = Cursor(0, 0, 0L)
          var n = 0
          var done = false
          while (!done) c.getQueryData(qid, cur, 64, forward = true,
            allowOverflow = false) match {
            case DataRecord(rows, offsets, _) =>
              n += rows.length
              cur = GraftWireClient.nextForward(offsets).get
            case DataEndOfFiles => done = true
            case other => fail(s"$t: $other")
          }
          results.put(t, n)
        })
        th.start(); th
      }
      threads.foreach(_.join(180000))
      expected.foreach { case (t, n) =>
        assert(results.get(t) === n, s"table $t")
      }

      // malformed body: the server answers THIS request with an Error
      // envelope instead of silently dropping the connection
      val sock = new java.net.Socket(
        java.net.InetAddress.getLoopbackAddress, server.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        val env = Envelope(msgNameId = Wire.Name.RunQuery,
          msgId = Wire.randomU128(), requestId = Wire.randomU128(),
          msgData = "this is not json".getBytes("UTF-8"))
        Wire.write(out, env)
        val resp = Wire.read(in).get
        assert(resp.requestId === env.requestId)
        // a fault on RunQuery answers in the request's OWN response
        // vocabulary (RunQueryResp::NotCreated), so a reference client
        // blocked in expect_msg::<RunQueryResp> succeeds the cast
        assert(resp.msgNameId === Wire.Name.RunQueryResp)
        assert(Json.parse(resp.msgData).asText() === "NotCreated")
      } finally sock.close()
    } finally server.stop()
  }

  test("protocol hardening: u64::MAX sentinels on the wire, u64 limit " +
       "clamp, limit==0 as graceful end-of-files, negative limit as " +
       "typed Error, typed fault replies, zero-row rec-file cursor guard") {
    // --- 1. backward sentinels must serialize as the LITERAL 2^64-1:
    // a strict reference server compares == std::u64::MAX
    // (query_data_handler.rs:216,305-308), so this acceptor plays that
    // strict server and fails the test if the client sends anything else
    val u64max = (BigInt(1) << 64) - 1
    def dataBody(variant: Int, meta: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val d = new DataOutputStream(bos)
      d.writeByte(variant); d.writeLong(meta.length.toLong); d.write(meta)
      d.flush(); bos.toByteArray
    }
    val strict = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    @volatile var sentinelSeen: Option[(BigInt, BigInt)] = None
    val acceptor = new Thread(() => {
      val s = strict.accept()
      try {
        val in = new DataInputStream(s.getInputStream)
        val out = new DataOutputStream(s.getOutputStream)
        val ident = Wire.read(in).get
        Wire.write(out, ident.reply(Wire.Name.Identify,
          Json.identify("Worker", Wire.randomU128())))
        val req = Wire.read(in).get
        val n = Json.parse(req.msgData)
        sentinelSeen = Some((Json.bigOf(n.get("file_row_group_idx")),
          Json.bigOf(n.get("row_idx"))))
        Wire.write(out, req.reply(Wire.Name.GetQueryDataResp,
          dataBody(4, Json.bytes(Json.text("ReachedEndOfFiles")))))
      } finally s.close()
    })
    acceptor.setDaemon(true); acceptor.start()
    val strictClient = new GraftWireClient(strict.getLocalPort)
    // the in-memory sentinel cursor — nextBackward's "last group of the
    // previous file / last row of the group" shape
    val resp = strictClient.getQueryData(BigInt(1),
      Cursor(0, Int.MaxValue, Long.MaxValue), 10, forward = false,
      allowOverflow = false)
    acceptor.join(10000)
    strict.close()
    assert(resp === DataEndOfFiles)
    assert(sentinelSeen === Some((u64max, u64max)),
      "backward sentinels must ride the wire as exactly 2^64-1")

    // --- the rest drives the real server over raw envelopes
    val tmp = java.nio.file.Files.createTempDirectory("wirehard").toString
    val runner = new AsyncQueryRunner(spark, tmp)
    val server = new GraftWireServer(runner).start()
    try {
      val client = new GraftWireClient(server.port)
      val qid = client.runQuery(
        s"select r_regionkey from read_files('$dir/region.parquet') " +
          "order by r_regionkey").get
      assert(client.waitForFinish(qid, maxWaitMs = 120000L) === "Complete")

      def rawRequest(nameId: Int, body: Array[Byte]): Envelope = {
        val sock = new java.net.Socket(
          java.net.InetAddress.getLoopbackAddress, server.port)
        try {
          val out = new DataOutputStream(sock.getOutputStream)
          val in = new DataInputStream(sock.getInputStream)
          val connId = Wire.randomU128()
          val ident = Envelope(msgNameId = Wire.Name.Identify,
            msgId = Wire.randomU128(), requestId = Wire.randomU128(),
            sentFromConnectionId = Some(connId),
            msgData = Json.identify("Connection", connId))
          Wire.write(out, ident)
          Wire.read(in) // Worker reply
          val env = Envelope(msgNameId = nameId, msgId = Wire.randomU128(),
            requestId = Wire.randomU128(), msgData = body)
          Wire.write(out, env)
          val r = Wire.read(in).get
          assert(r.requestId === env.requestId)
          r
        } finally sock.close()
      }
      def pageBody(limit: BigInt): Array[Byte] = {
        import com.fasterxml.jackson.databind.JsonNode
        val b = Json.obj()
        b.set[JsonNode]("query_id", Json.big(qid))
        b.set[JsonNode]("file_idx", Json.long(0L))
        b.set[JsonNode]("file_row_group_idx", Json.long(0L))
        b.set[JsonNode]("row_idx", Json.long(0L))
        b.set[JsonNode]("limit", Json.big(limit))
        b.set[JsonNode]("forward", Json.bool(true))
        b.set[JsonNode]("allow_overflow", Json.bool(false))
        Json.bytes(b)
      }
      def variantOf(data: Array[Byte]): Int = data(0) & 0xff

      // --- 2. a u64 limit above Int.MaxValue clamps (asInt would wrap it
      // to zero/negative and serve a spurious end-of-files)
      val huge = rawRequest(Wire.Name.GetQueryData, pageBody(BigInt(2).pow(63)))
      assert(huge.msgNameId === Wire.Name.GetQueryDataResp)
      assert(variantOf(huge.msgData) === 2,
        "u64 limit must clamp and serve the Record page")

      // --- 3. limit == 0 ends the walk gracefully, matching the
      // reference (query_data_handler.rs:255 returns Ok(None) →
      // ReachedEndOfFiles): a pagination loop that computes a zero
      // remaining limit terminates instead of erroring. A negative
      // limit can't arise from a u64 field — garbage stays typed Error.
      val zero = rawRequest(Wire.Name.GetQueryData, pageBody(BigInt(0)))
      assert(zero.msgNameId === Wire.Name.GetQueryDataResp)
      assert(variantOf(zero.msgData) === 4,
        "limit==0 must answer ReachedEndOfFiles like the reference")
      val neg = rawRequest(Wire.Name.GetQueryData, pageBody(BigInt(-1)))
      assert(neg.msgNameId === Wire.Name.GetQueryDataResp)
      assert(variantOf(neg.msgData) === 3,
        "negative (garbage) limit must answer the typed Error variant")

      // --- 4. a malformed body on a typed request answers in that
      // request's own response vocabulary, not CommonGenericResponse
      val badData = rawRequest(Wire.Name.GetQueryData,
        "not json".getBytes("UTF-8"))
      assert(badData.msgNameId === Wire.Name.GetQueryDataResp)
      assert(variantOf(badData.msgData) === 3)
      val badStatus = rawRequest(Wire.Name.GetQueryStatus,
        "not json".getBytes("UTF-8"))
      assert(badStatus.msgNameId === Wire.Name.GetQueryStatusResp)
      assert(Json.parse(badStatus.msgData).get("Status").has("Error"))
    } finally server.stop()

    // --- 5. a zero-row rec file (empty batch-materialized member) must
    // resolve backward cursors to NotFound, not throw out-of-bounds
    import graft.exec.{CursorPager, ResultMaterializer}
    val rs = ResultMaterializer.ResultSet("/tmp/none", Vector(
      ResultMaterializer.ResultFile("/tmp/none/rec_0.parquet", Vector(10L)),
      ResultMaterializer.ResultFile("/tmp/none/rec_1.parquet", Vector.empty)))
    val pager = new CursorPager(spark, rs)
    assert(pager.resolveClientCursor(1, Long.MaxValue, Long.MaxValue,
      forward = false) === Left(CursorPager.CursorMiss.NotFound))
    assert(pager.resolveClientCursor(0, Long.MaxValue, Long.MaxValue,
      forward = false) === Right(Cursor(0, 0, 9L)))
  }

  test("mid-frame client disconnect: a client that dies while a large " +
       "Arrow page is being written leaves the server fully serving " +
       "other connections") {
    val tmp = java.nio.file.Files.createTempDirectory("wiredrop").toString
    val runner = new AsyncQueryRunner(spark, tmp)
    val server = new GraftWireServer(runner).start()
    try {
      val client = new GraftWireClient(server.port)
      val qid = client.runQuery(
        s"select o_orderkey, o_totalprice, o_orderpriority from " +
          s"read_files('$dir/orders.parquet') order by o_orderkey").get
      assert(client.waitForFinish(qid, maxWaitMs = 120000L) === "Complete")
      // rude client: request a large page, read 8 bytes of the reply,
      // vanish — the server's in-flight frame write hits the reset
      for (_ <- 0 until 5) {
        val sock = new java.net.Socket(
          java.net.InetAddress.getLoopbackAddress, server.port)
        sock.setSoLinger(true, 0) // RST on close, the rudest teardown
        val out = new DataOutputStream(sock.getOutputStream)
        val in = new DataInputStream(sock.getInputStream)
        val connId = Wire.randomU128()
        Wire.write(out, Envelope(msgNameId = Wire.Name.Identify,
          msgId = Wire.randomU128(), requestId = Wire.randomU128(),
          sentFromConnectionId = Some(connId),
          msgData = Json.identify("Connection", connId)))
        Wire.read(in)
        val b = Json.obj()
        import com.fasterxml.jackson.databind.JsonNode
        b.set[JsonNode]("query_id", Json.big(qid))
        b.set[JsonNode]("file_idx", Json.long(0L))
        b.set[JsonNode]("file_row_group_idx", Json.long(0L))
        b.set[JsonNode]("row_idx", Json.long(0L))
        b.set[JsonNode]("limit", Json.long(1500L))
        b.set[JsonNode]("forward", Json.bool(true))
        b.set[JsonNode]("allow_overflow", Json.bool(false))
        Wire.write(out, Envelope(msgNameId = Wire.Name.GetQueryData,
          msgId = Wire.randomU128(), requestId = Wire.randomU128(),
          msgData = Json.bytes(b)))
        in.readLong() // first 8 bytes of the reply frame...
        sock.close()  // ...and gone, mid-frame
      }
      // the server must still serve a fresh, polite client in full
      val after = client.getQueryData(qid, Cursor(0, 0, 0L), 1500,
        forward = true, allowOverflow = false)
      after match {
        case DataRecord(rows, _, _) => assert(rows.length === 1500)
        case other => fail(s"server degraded after disconnects: $other")
      }
      assert(client.getQueryStatus(qid) === "Complete")
    } finally server.stop()
  }

  test("query metrics over the wire: the graft-only GetQueryMetrics " +
       "message carries the exact execution-cost summary, decoded from " +
       "wire bytes alone — and GetQueryStatusResp stays a pure " +
       "single-key serde enum") {
    val tmp = java.nio.file.Files.createTempDirectory("wiremet").toString
    val runner = new AsyncQueryRunner(spark, tmp)
    val server = new GraftWireServer(runner).start()
    try {
      val client = new GraftWireClient(server.port)
      val qid = client.runQuery(
        s"select r_regionkey, r_name from read_files('$dir/region.parquet')").get
      assert(client.waitForFinish(qid, maxWaitMs = 120000L) === "Complete")
      // GetQueryStatusResp is an externally-tagged serde enum on the
      // reference side (query.rs:308): serde_json's deserialize_enum
      // requires the body to be a map with EXACTLY one key, so the
      // Complete body must never carry sibling fields (metrics ride
      // their own message) — this is the byte-compat regression guard
      locally {
        val sock = new java.net.Socket(
          java.net.InetAddress.getLoopbackAddress, server.port)
        try {
          val out = new DataOutputStream(sock.getOutputStream)
          val in = new DataInputStream(sock.getInputStream)
          val connId = Wire.randomU128()
          Wire.write(out, Envelope(msgNameId = Wire.Name.Identify,
            msgId = Wire.randomU128(), requestId = Wire.randomU128(),
            sentFromConnectionId = Some(connId),
            msgData = Json.identify("Connection", connId)))
          Wire.read(in)
          import com.fasterxml.jackson.databind.JsonNode
          val b = Json.obj(); b.set[JsonNode]("query_id", Json.big(qid))
          val env = Envelope(msgNameId = Wire.Name.GetQueryStatus,
            msgId = Wire.randomU128(), requestId = Wire.randomU128(),
            msgData = Json.bytes(b))
          Wire.write(out, env)
          val r = Wire.read(in).get
          val body = Json.parse(r.msgData)
          assert(body.isObject && body.size() === 1 &&
            body.has("Status") && body.get("Status").asText() === "Complete",
            s"Complete status body must be the single-key enum map, got $body")
        } finally sock.close()
      }
      // metrics land asynchronously (listener bus) — bounded poll
      var m = client.getQueryMetrics(qid)
      var rounds = 0
      while (m.isEmpty && rounds < 200) { Thread.sleep(25); m = m.orElse(
        client.getQueryMetrics(qid)); rounds += 1 }
      assert(m.nonEmpty, "no metrics served for a Complete query")
      // exact values: region.parquet is ONE file of exactly 5 rows, and
      // a projection scan shuffles nothing
      assert(m.get.scanRows === 5L, m.get.toString)
      assert(m.get.filesRead === 1L, m.get.toString)
      assert(m.get.shuffleRecordsWritten === 0L, m.get.toString)
      assert(m.get.durationMs >= 0L)
      // the wire bytes carry EXACTLY the runner's summary — field by field
      val uuid = Wire.u128ToUuid(qid)
      assert(runner.metrics(uuid) === m, "wire decode != runner summary")
      // a non-complete / unknown id serves no metrics
      assert(client.getQueryMetrics(qid + 1) === None)
    } finally server.stop()
  }

  test("serve-while-materializing over the wire: an INCREMENTAL query's " +
       "committed pages are fetchable while its status is still Running") {
    val tmp = java.nio.file.Files.createTempDirectory("wireinc").toString
    val runner = new AsyncQueryRunner(spark, tmp)
    // small commit unit so rec_N files appear long before the slow query
    // finishes — the reference's serve-while-materializing posture
    val server = new GraftWireServer(runner, incremental = true,
      incrementalRowsPerFile = 100).start()
    try {
      val client = new GraftWireClient(server.port)
      spark.udf.register("graft_test_sleep", (ms: Int, x: Long) => {
        Thread.sleep(ms.toLong); x
      })
      val qid = client.runQuery(
        s"select graft_test_sleep(10, o_orderkey) as k " +
          s"from read_files('$dir/orders.parquet')").get
      // poll over the wire until a page arrives while still Running
      var sawRunningPage = false
      var rounds = 0
      while (!sawRunningPage && rounds < 600) {
        val status = client.getQueryStatus(qid)
        if (status == "Running") {
          client.getQueryData(qid, Cursor(0, 0, 0L), 50, forward = true,
            allowOverflow = false) match {
            case DataRecord(rows, _, _) if rows.nonEmpty =>
              sawRunningPage = true
              // mid-stream introspection: a client paging a live
              // incremental query sees monotonically growing commit
              // progress over the graft-only GetQueryMetrics message
              client.getQueryProgress(qid) match {
                case Some((files1, rows1)) =>
                  assert(files1 >= 1L && rows1 >= 100L,
                    s"served a page but progress says ($files1, $rows1)")
                  var grew = false
                  var tries = 0
                  while (!grew && tries < 400 &&
                      client.getQueryStatus(qid) == "Running") {
                    client.getQueryProgress(qid) match {
                      case Some((f2, r2)) =>
                        assert(f2 >= files1 && r2 >= rows1,
                          "commit progress must be monotone")
                        grew = f2 > files1 || r2 > rows1
                      case None => () // completed between polls
                    }
                    if (!grew) Thread.sleep(10)
                    tries += 1
                  }
                  // the query sleeps 10ms/row with 100-row commits, so
                  // unless it completed between polls, growth must show
                  if (!grew)
                    assert(client.getQueryStatus(qid) != "Running",
                      "no progress growth observed on a live query")
                case None =>
                  // legal only if the query finished between the page
                  // and the progress poll
                  assert(client.getQueryStatus(qid) != "Running",
                    "running incremental query served no progress")
              }
              // past the COMMITTED end of a still-running query must be
              // the retryable miss, never the terminal ReachedEndOfFiles
              // — a live-paging client would otherwise stop for good
              // and silently truncate the result
              val pastEnd = client.getQueryData(qid, Cursor(9999, 0, 0L),
                50, forward = true, allowOverflow = false)
              // only a definitive race-free observation may fail: if the
              // query completed between the two calls, EndOfFiles is fine
              if (pastEnd == DataEndOfFiles &&
                  client.getQueryStatus(qid) == "Running")
                fail("terminal EndOfFiles sent while still Running")
            case _ => Thread.sleep(25)
          }
        } else if (status == "Complete") rounds = 600 // too late — fail below
        else Thread.sleep(10)
        rounds += 1
      }
      assert(sawRunningPage,
        "no page was served while the query was still Running")
      // after completion the full result pages normally
      assert(client.waitForFinish(qid, maxWaitMs = 120000L) === "Complete")
      var cursor = Cursor(0, 0, 0L)
      var total = 0
      var done = false
      while (!done) client.getQueryData(qid, cursor, 400, forward = true,
        allowOverflow = false) match {
        case DataRecord(rows, offsets, _) =>
          total += rows.length
          cursor = GraftWireClient.nextForward(offsets).get
        case DataEndOfFiles => done = true
        case other => fail(s"unexpected: $other")
      }
      assert(total === 1500)
    } finally server.stop()
  }
}
