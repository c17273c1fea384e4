package graft.exec

import org.apache.spark.sql.{Row, SparkSession}
import graft.exec.ResultMaterializer.ResultSet

/** Bidirectional cursor paging over a materialized result directory —
  * the reference's client result-retrieval surface: a
  * `(file_idx, row_group_idx, row_idx)` cursor plus limit and direction
  * (query_data_handler.rs:239-571, query_data_iterator.rs:22-142), with
  * per-row offsets returned so clients can resume anywhere.
  *
  * This is deliberately driver-side logic (SURVEY.md §4.3): paging a
  * materialized result is an app/serving concern, not a distributed one.
  * Only the files a page actually touches are read (and cached); row-group
  * row counts come from footers via ResultMaterializer, so skipping to a
  * cursor is O(1) metadata work, mirroring the reference's row-group
  * slicing.
  */
final class CursorPager(spark: SparkSession, rs: ResultSet) {
  import CursorPager._

  private val fileRows: Vector[Long] = rs.files.map(_.rows)
  private val fileStarts: Vector[Long] = fileRows.scanLeft(0L)(_ + _)
  val totalRows: Long = fileStarts.last

  // Row-group starts within each file.
  private val groupStarts: Vector[Vector[Long]] =
    rs.files.map(_.rowGroupRows.scanLeft(0L)(_ + _))

  private val cache =
    new java.util.LinkedHashMap[Int, Array[Row]](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Int, Array[Row]]): Boolean = size() > 8
    }

  private def fileData(i: Int): Array[Row] = {
    val cached = cache.get(i)
    if (cached != null) cached
    else {
      val rows = spark.read.parquet(rs.files(i).path).collect()
      cache.put(i, rows)
      rows
    }
  }

  /** Global row index addressed by a cursor. */
  def toGlobal(c: Cursor): Long =
    fileStarts(c.file) + groupStarts(c.file)(c.rowGroup) + c.row

  /** Cursor for a global row index (row expressed relative to its row
    * group, exactly like the reference's offsets).
    */
  def toCursor(g: Long): Cursor = {
    require(g >= 0 && g < totalRows, s"row $g out of [0, $totalRows)")
    var f = java.util.Arrays.binarySearch(fileStarts.toArray, g)
    if (f < 0) f = -f - 2
    while (f + 1 < fileRows.length && fileStarts(f + 1) <= g) f += 1
    val inFile = g - fileStarts(f)
    val gs = groupStarts(f)
    var rg = 0
    while (rg + 1 < gs.length - 1 && gs(rg + 1) <= inFile) rg += 1
    Cursor(f, rg, inFile - gs(rg))
  }

  /** Fetch up to `limit` rows. Forward: rows [cursor, cursor+limit).
    * Backward: the `limit` rows immediately before the cursor, returned in
    * forward order — so paging back then forward round-trips. Partial
    * pages at either boundary are returned as-is (the reference's
    * allow_overflow behavior).
    */
  def page(cursor: Cursor, limit: Int, forward: Boolean = true): PageResult = {
    val at = toGlobal(cursor)
    val (start, end) =
      if (forward) (at, math.min(at + limit, totalRows))
      else (math.max(at - limit, 0L), at)
    if (start >= end) return PageResult(Seq.empty, Seq.empty, None)
    val rows = Vector.newBuilder[Row]
    val offsets = Vector.newBuilder[Cursor]
    var g = start
    while (g < end) {
      val c = toCursor(g)
      rows += fileData(c.file)((g - fileStarts(c.file)).toInt)
      offsets += c
      g += 1
    }
    val next =
      if (forward) { if (end < totalRows) Some(toCursor(end)) else None }
      else { if (start > 0) Some(toCursor(start)) else None }
    PageResult(rows.result(), offsets.result(), next)
  }
}

object CursorPager {
  /** (file, row_group, row-within-group) — the reference's client cursor
    * (query_data_iterator.rs:22-32).
    */
  final case class Cursor(file: Int, rowGroup: Int, row: Long)

  final case class PageResult(rows: Seq[Row], offsets: Seq[Cursor],
                              next: Option[Cursor])

  val Start: Cursor = Cursor(0, 0, 0L)
}
