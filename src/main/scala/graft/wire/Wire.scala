package graft.wire

import java.io.{DataInputStream, DataOutputStream}

/** The reference's length-prefixed wire envelope, byte-for-byte
  * (reference: messages/message.rs:95-129 `SerializedMessage`, parse at
  * :217-274, to_bytes at :298-321). All integers big-endian (the Rust
  * side uses the `bytes` crate's `put_u32`/`put_u128`, which are BE).
  *
  * Layout of one frame:
  * {{{
  *   u32  header_len            // = 158, counted from data_len onward
  *   u64  data_len              // length of msg_data
  *   u16  header_version        // 0
  *   u16  msg_name_id           // MessageName::as_u16 (message.rs:605)
  *   u128 msg_id
  *   u128 request_id            // replies echo this (message.rs:394-403)
  *   u8   sent_from_flags       // bit0 worker, bit1 query, bit2 op, bit3 conn
  *   u128 sent_from_worker_id
  *   u128 sent_from_query_id
  *   u128 sent_from_operation_id
  *   u128 sent_from_connection_id
  *   u8   routing_flags         // bit0 worker, bit1 op, bit2 conn
  *   u128 route_to_worker_id
  *   u128 route_to_operation_id
  *   u128 route_to_connection_id
  *   u8[data_len] msg_data      // serde_json body (GetQueryDataResp: custom)
  * }}}
  * Total frame length = 4 + header_len + data_len (message.rs:268).
  *
  * u128 ids are carried as [[BigInt]]; absent optional ids serialize as
  * zeroes with their flag bit clear, exactly like the reference.
  */
final case class Envelope(
    msgNameId: Int,
    msgId: BigInt,
    requestId: BigInt,
    sentFromWorkerId: Option[BigInt] = None,
    sentFromQueryId: Option[BigInt] = None,
    sentFromOperationId: Option[BigInt] = None,
    sentFromConnectionId: Option[BigInt] = None,
    routeToWorkerId: Option[BigInt] = None,
    routeToOperationId: Option[BigInt] = None,
    routeToConnectionId: Option[BigInt] = None,
    msgData: Array[Byte] = Array.emptyByteArray) {

  /** Reply envelope: echo request_id, route back to the sender — the
    * reference's `Message::reply` (message.rs:394-403).
    */
  def reply(nameId: Int, data: Array[Byte]): Envelope =
    Envelope(msgNameId = nameId, msgId = Wire.randomU128(),
      requestId = requestId,
      routeToWorkerId = sentFromWorkerId,
      routeToOperationId = sentFromOperationId,
      routeToConnectionId = sentFromConnectionId,
      msgData = data)
}

object Wire {
  /** header_len: 8+2+2+16+16+1+16+16+16+16+1+16+16+16 (message.rs:294). */
  val HeaderLen: Int = 158
  val HeaderVersion: Int = 0

  /** MessageName::as_u16 (message.rs:605-635) — only the names the client
    * protocol uses; the exchange-internal ones are Spark's shuffle here
    * (SURVEY.md §2.1 row 7).
    */
  object Name {
    val Ping = 0
    val Identify = 1
    val RunQuery = 2
    val RunQueryResp = 3
    val CommonGenericResponse = 9
    val OperatorShutdown = 12
    val GetQueryStatus = 13
    val GetQueryStatusResp = 14
    val GetQueryData = 15
    val GetQueryDataResp = 16
    /** Graft extension pair, OUTSIDE the reference's id space
      * (message.rs:605-635 stops at 16): execution-cost introspection
      * the reference vocabulary lacks. A reference client never sends
      * these; a reference server answers them with its unknown-message
      * path — GetQueryStatusResp itself stays byte-compatible (it is an
      * externally-tagged serde enum, so it cannot carry sibling fields:
      * serde_json's deserialize_enum requires exactly one key).
      */
    val GetQueryMetrics = 100
    val GetQueryMetricsResp = 101
  }

  private val rng = new java.security.SecureRandom()
  def randomU128(): BigInt = BigInt(128, rng)

  /** UUID string (AsyncQueryRunner's query ids) ↔ the reference's u128
    * query ids: a UUID IS its 128 bits.
    */
  def uuidToU128(id: String): BigInt = {
    val u = java.util.UUID.fromString(id)
    (BigInt(u.getMostSignificantBits) & U64Mask) << 64 |
      (BigInt(u.getLeastSignificantBits) & U64Mask)
  }
  def u128ToUuid(v: BigInt): String =
    new java.util.UUID((v >> 64).toLong, v.toLong).toString
  private val U64Mask = (BigInt(1) << 64) - 1

  private def writeU128(out: DataOutputStream, v: BigInt): Unit = {
    out.writeLong((v >> 64).toLong)
    out.writeLong(v.toLong)
  }
  private def readU128(in: DataInputStream): BigInt = {
    val hi = in.readLong(); val lo = in.readLong()
    ((BigInt(hi) & U64Mask) << 64) | (BigInt(lo) & U64Mask)
  }

  def write(out: DataOutputStream, e: Envelope): Unit = {
    out.writeInt(HeaderLen)
    out.writeLong(e.msgData.length.toLong)
    out.writeShort(HeaderVersion)
    out.writeShort(e.msgNameId)
    writeU128(out, e.msgId)
    writeU128(out, e.requestId)
    var sf = 0
    if (e.sentFromWorkerId.isDefined) sf |= 1
    if (e.sentFromQueryId.isDefined) sf |= 2
    if (e.sentFromOperationId.isDefined) sf |= 4
    if (e.sentFromConnectionId.isDefined) sf |= 8
    out.writeByte(sf)
    writeU128(out, e.sentFromWorkerId.getOrElse(BigInt(0)))
    writeU128(out, e.sentFromQueryId.getOrElse(BigInt(0)))
    writeU128(out, e.sentFromOperationId.getOrElse(BigInt(0)))
    writeU128(out, e.sentFromConnectionId.getOrElse(BigInt(0)))
    var rf = 0
    if (e.routeToWorkerId.isDefined) rf |= 1
    if (e.routeToOperationId.isDefined) rf |= 2
    if (e.routeToConnectionId.isDefined) rf |= 4
    out.writeByte(rf)
    writeU128(out, e.routeToWorkerId.getOrElse(BigInt(0)))
    writeU128(out, e.routeToOperationId.getOrElse(BigInt(0)))
    writeU128(out, e.routeToConnectionId.getOrElse(BigInt(0)))
    out.write(e.msgData)
    out.flush()
  }

  /** Blocking read of one frame; None on a clean EOF at a frame boundary
    * (the peer closed), exactly the client's read loop contract
    * (async_query_client.rs:246-254).
    */
  def read(in: DataInputStream): Option[Envelope] = {
    val first = try in.readInt() catch {
      case _: java.io.EOFException => return None
    }
    val headerLen = first
    val dataLen = in.readLong()
    // corrupt or hostile frames must fail LOUDLY here, not as a
    // NegativeArraySizeException past the catch-net or a silent stream
    // desync: negative lengths and short headers are protocol errors
    require(headerLen >= HeaderLen,
      s"frame header_len $headerLen below the v$HeaderVersion layout size")
    require(dataLen >= 0 && dataLen <= (1L << 30),
      s"frame data_len $dataLen outside [0, 1 GiB]")
    val version = in.readShort()
    require(version == HeaderVersion, s"unknown header version $version")
    val nameId = in.readShort() & 0xffff
    val msgId = readU128(in)
    val requestId = readU128(in)
    val sf = in.readByte() & 0xff
    val sfW = readU128(in); val sfQ = readU128(in)
    val sfO = readU128(in); val sfC = readU128(in)
    val rf = in.readByte() & 0xff
    val rtW = readU128(in); val rtO = readU128(in); val rtC = readU128(in)
    // forward compat: a longer header skips the bytes we don't know
    val extra = headerLen - HeaderLen
    if (extra > 0) in.skipNBytes(extra.toLong)
    val data = new Array[Byte](dataLen.toInt)
    in.readFully(data)
    def opt(flag: Boolean, v: BigInt): Option[BigInt] = if (flag) Some(v) else None
    Some(Envelope(nameId, msgId, requestId,
      opt((sf & 1) != 0, sfW), opt((sf & 2) != 0, sfQ),
      opt((sf & 4) != 0, sfO), opt((sf & 8) != 0, sfC),
      opt((rf & 1) != 0, rtW), opt((rf & 2) != 0, rtO),
      opt((rf & 4) != 0, rtC), data))
  }
}

/** serde_json bodies of the client-protocol messages. Built on Jackson
  * (already on Spark's classpath) with exact big-integer handling —
  * connection ids are client-random u128s that overflow Long.
  *
  * serde enum JSON conventions (what the Rust side emits/expects):
  * unit variant → `"Name"`; struct variant → `{"Name":{...fields}}`
  * (messages/common.rs, messages/query.rs).
  */
object Json {
  import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.ObjectNode

  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.USE_BIG_INTEGER_FOR_INTS, true)

  def parse(data: Array[Byte]): JsonNode = mapper.readTree(data)
  def bytes(n: JsonNode): Array[Byte] = mapper.writeValueAsBytes(n)

  def obj(): ObjectNode = mapper.createObjectNode()
  def text(s: String): JsonNode = mapper.getNodeFactory.textNode(s)
  def big(v: BigInt): JsonNode =
    mapper.getNodeFactory.numberNode(v.bigInteger)
  def long(v: Long): JsonNode = mapper.getNodeFactory.numberNode(v)
  def bool(v: Boolean): JsonNode = mapper.getNodeFactory.booleanNode(v)

  def bigOf(n: JsonNode): BigInt = BigInt(n.bigIntegerValue())

  /** `{"Connection":{"id":N}}` / `{"Worker":{"id":N}}` (common.rs:10-13). */
  def identify(kind: String, id: BigInt): Array[Byte] = {
    val inner = obj(); inner.set[JsonNode]("id", big(id))
    val o = obj(); o.set[JsonNode](kind, inner); bytes(o)
  }
}
