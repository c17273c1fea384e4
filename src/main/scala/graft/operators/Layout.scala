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

  /** Bits taken from each dimension in the DEMO query; 2*ZBits = 32-bit
    * Z values. This is a per-deployment knob, not a universal constant:
    * it must cover the key domain (TPC-H l_partkey reaches
    * 200,000 x sf, so 16 bits holds to sf ~0.32; a 100 TB layout pass
    * picks 24-31 bits — [[zInterleave]] takes the width as a parameter
    * and is correct to 31). [[zorderLayout]] guards the bound with a
    * per-row raise_error instead of silently aliasing distant keys into
    * one zval, which would quietly void the rectangle-pruning property.
    */
  val ZBits = 16

  /** Top bits of z used as the coarse layout bucket (1024 buckets). */
  val ZBucketShift = 2 * ZBits - 10

  /** Morton-interleave the low `zBits` bits of two non-negative longs:
    * dimension a occupies even bit positions, b odd. A 2*zBits-term
    * shift/mask sum — entirely inside whole-stage codegen, no UDF.
    * Valid for zBits <= 31 (62-bit Z values in a long).
    */
  def zInterleave(a: Column, b: Column, zBits: Int = ZBits): Column = {
    require(zBits >= 1 && zBits <= 31, s"zBits=$zBits outside [1,31]")
    (0 until zBits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Left-align a key's occupied bit width to the z width — the standard
    * equal-weight normalization a layout pass applies BEFORE
    * interleaving when dimensions span different domains. Without it
    * the wider dimension's high bits dominate every z-range split: a
    * 2048-key partkey against a 128-key suppkey puts partkey bits at
    * all the significant interleaved positions, every file's suppkey
    * min/max spans the whole domain, and suppkey predicates prune
    * NOTHING (LayoutSpec measures exactly this). Aligned, both
    * dimensions' top bits alternate at the top of z and both prune.
    * `domainBits` is ceil(log2(domain)) — a per-deployment stat, like
    * ZBits itself.
    */
  def zAligned(c: Column, domainBits: Int, zBits: Int = ZBits): Column = {
    require(domainBits >= 1 && domainBits <= zBits,
      s"domainBits=$domainBits outside [1,$zBits]")
    shiftleft(c, zBits - domainBits)
  }

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
    // loud bound check: a key past 2^ZBits would alias distant keys to
    // one zval and silently break the rectangle property — fail the job
    // instead (two codegen'd comparisons per row; never fires in-range,
    // so the oracle SQL needs no mirror of it)
    def guarded(c: Column): Column =
      when(c < 0L || c > mask, raise_error(concat(
        lit(s"zorderLayout: key out of [0, $mask] (ZBits=$ZBits): "),
        c.cast("string")))).otherwise(c)
    table(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_suppkey"),
      zInterleave(guarded(col("l_partkey")),
        guarded(col("l_suppkey"))).as("zval"))
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
