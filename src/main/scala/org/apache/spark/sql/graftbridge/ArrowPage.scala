package org.apache.spark.sql.graftbridge

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils

/** Arrow IPC encoding of a result page — the wire format the reference
  * serves result pages in (messages/query.rs:78,137 wraps pages as Arrow
  * IPC stream bytes in its envelope; messages/message.rs:95-129 decodes
  * them), so non-JVM clients can consume pages without JVM `Row`
  * marshalling.
  *
  * Lives in a subpackage of `org.apache.spark.sql` because Spark's
  * type-mapping and value-writing machinery (`ArrowUtils`, `ArrowWriter`)
  * is `private[sql]` — reusing it gives exactly the Spark↔Arrow type
  * mapping every Spark-adjacent Arrow client (pandas, Spark Connect)
  * already speaks, for every Spark type including nested arrays/structs,
  * instead of a hand-rolled subset converter that would drift.
  */
object ArrowPage {

  /** Per-schema page encoder: the Row→InternalRow serializer (encoder
    * resolution + codegen) and the Arrow schema conversion are built
    * ONCE here, not per page — callers (CursorPager) hold one of these
    * for the pager's lifetime and pay only the batch write per page.
    */
  final class PageEncoder private[ArrowPage] (
      schema: StructType, timeZoneId: String) {
    private val toInternal =
      ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
    private val arrowSchema = ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)

    /** Encode rows as ONE self-describing Arrow IPC stream: schema
      * header, a single record batch, end-of-stream marker — readable by
      * any `ArrowStreamReader` (Java, PyArrow, arrow-rs). Pages are
      * bounded by the pager's `limit`, so one batch per page is the
      * right shape.
      */
    def encode(rows: Seq[Row]): Array[Byte] = {
      val allocator = ArrowUtils.rootAllocator
        .newChildAllocator("graft-arrow-page", 0, Long.MaxValue)
      try {
        val root = VectorSchemaRoot.create(arrowSchema, allocator)
        try {
          val writer = ArrowWriter.create(root)
          rows.foreach(r => writer.write(toInternal(r)))
          writer.finish()
          val out = new ByteArrayOutputStream()
          val sw = new ArrowStreamWriter(root, null, Channels.newChannel(out))
          try { sw.start(); sw.writeBatch(); sw.end() } finally sw.close()
          out.toByteArray
        } finally root.close()
      } finally allocator.close()
    }
  }

  def encoder(schema: StructType, timeZoneId: String): PageEncoder =
    new PageEncoder(schema, timeZoneId)
}
