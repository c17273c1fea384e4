package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.table

/** Physical-layout operators: Z-order (Morton) clustering for
  * multi-dimensional data skipping. Sorting 100 TB by one key makes
  * min/max footer stats razor-sharp on that key and useless on every
  * other; interleaving the bits of two keys gives a single sort order
  * whose range partitions stay rectangular in BOTH dimensions — a scan
  * with a predicate on either key prunes most files. This is the
  * standard lakehouse OPTIMIZE ZORDER BY device, here as a plain
  * deterministic expression (so the whole mapping is oracle-checkable)
  * feeding Spark's own repartitionByRange/sortWithinPartitions write
  * path (see [[zorderWrite]] and exec.ShardedExport for the sink side).
  */
object Layout {

  /** Bits taken from each dimension; 2*ZBits = 32-bit Z values. */
  val ZBits = 16

  /** Top bits of z used as the coarse layout bucket (1024 buckets). */
  val ZBucketShift = 2 * ZBits - 10

  /** Morton-interleave the low [[ZBits]] bits of two non-negative longs:
    * dimension a occupies even bit positions, b odd. A 32-term
    * shift/mask sum — entirely inside whole-stage codegen, no UDF.
    */
  def zInterleave(a: Column, b: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Per-row Z-order assignment over (l_partkey, l_suppkey)
    * (oracle-checked): emits the Morton value and the coarse bucket a
    * layout pass would cluster by. Per-row at scan speed — the actual
    * data movement is one repartitionByRange on zval at write time
    * ([[zorderWrite]]); this query pins the mapping every engine must
    * agree on. The skipping property (each bucket spans at most
    * 2^(ZBits-5) distinct values of EITHER key) is asserted in the
    * spec — that bound is what makes min/max pruning fire for both
    * part- and supplier-keyed predicates.
    */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val mask = (1L << ZBits) - 1L
    table(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_suppkey"),
      zInterleave(col("l_partkey").bitwiseAND(lit(mask)),
        col("l_suppkey").bitwiseAND(lit(mask))).as("zval"))
      .withColumn("zbucket", shiftright(col("zval"), ZBucketShift))
  }

  /** The write-side layout pass: range-partition by zval (Spark samples
    * the distribution, so partitions are balanced even when the key
    * space is sparse), sort within partitions, and hand each partition
    * to the parquet writer — every file then covers a tight z-range,
    * i.e. a tight rectangle in (partkey, suppkey) space for the footer
    * stats. Used by the spec; production sinks compose this with
    * exec.ShardedExport.
    */
  def zorderWrite(df: DataFrame, nPartitions: Int): DataFrame =
    df.repartitionByRange(nPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))
}
