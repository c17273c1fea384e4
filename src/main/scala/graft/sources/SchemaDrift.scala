package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema drift across file generations — the reference's own acknowledged
  * TODO (reference: DEV_NOTES.md "Allow for differences in schema"; its
  * `read_files` task binds the first file's Arrow schema and fails on any
  * file that differs, read_files_task.rs:156-291).
  *
  * On a real lake the common drift shapes are a producer ADDING a column
  * and WIDENING a numeric type (int32 id outgrows to int64) across file
  * generations. Spark's two built-in answers both fall short at scale:
  *
  *  - `mergeSchema=true` reads EVERY file footer (O(files) driver work on
  *    a 100 TB directory) and then hard-fails on the widening case —
  *    `CANNOT_MERGE_SCHEMAS` on INT vs BIGINT (StructType.merge has no
  *    numeric lattice).
  *  - A naive per-generation read + unionByName plans one scan per
  *    generation and loses scan-level pushdown across the union.
  *
  * The scale-correct recipe, implemented here:
  *
  *  1. discover ONE schema per generation directory (Spark reads a single
  *     footer per dir under the default mergeSchema=false) — O(gens), not
  *     O(files);
  *  2. [[widenMerge]] them under the numeric widening lattice
  *     int < long < double (plus date < timestamp), union-by-name with
  *     first-seen column order — the merge Spark refuses to do;
  *  3. ONE `spark.read.schema(target).parquet(gen1, gen2, ...)` scan —
  *     Spark 4's vectorized parquet reader widens INT32 cells into BIGINT
  *     vectors natively and fills absent columns with null, so the whole
  *     mixed directory is a single FileSourceScan with normal filter and
  *     column pushdown.
  */
object SchemaDrift {

  final class DriftConflict(msg: String) extends Exception(msg)

  /** Numeric widening lattice. Returns the narrower-to-wider join of two
    * primitive types, or throws [[DriftConflict]] — a string column that
    * becomes an int across generations is producer breakage, not drift,
    * and silently coercing it would corrupt every downstream read.
    */
  private[sources] def widen(a: DataType, b: DataType): DataType =
    (a, b) match {
      case (x, y) if x == y => x
      case (IntegerType, LongType) | (LongType, IntegerType) => LongType
      case (ShortType, IntegerType) | (IntegerType, ShortType) => IntegerType
      case (ShortType, LongType) | (LongType, ShortType) => LongType
      case (ByteType, x @ (ShortType | IntegerType | LongType)) => x
      case (x @ (ShortType | IntegerType | LongType), ByteType) => x
      case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
      case (IntegerType | ShortType | ByteType, FloatType) => FloatType
      case (FloatType, IntegerType | ShortType | ByteType) => FloatType
      case (ByteType | ShortType | IntegerType | LongType, DoubleType) =>
        DoubleType
      case (DoubleType, ByteType | ShortType | IntegerType | LongType) =>
        DoubleType
      case (DateType, TimestampType) | (TimestampType, DateType) =>
        TimestampType
      case (x, y) =>
        throw new DriftConflict(
          s"cannot widen ${x.simpleString} with ${y.simpleString} — " +
            "not a drift, a producer contract break")
    }

  /** Union-by-name merge of per-generation schemas under [[widen]].
    * Column order is first-seen (oldest generation first, new columns
    * appended as they appear) so the target schema is stable as
    * generations accumulate. Every merged field is nullable: a column
    * absent from any one generation reads as null there.
    */
  def widenMerge(schemas: Seq[StructType]): StructType = {
    require(schemas.nonEmpty, "widenMerge of no schemas")
    val order = scala.collection.mutable.LinkedHashMap[String, DataType]()
    for (s <- schemas; f <- s.fields) {
      order.get(f.name) match {
        case None => order(f.name) = f.dataType
        case Some(t) => order(f.name) = widen(t, f.dataType)
      }
    }
    StructType(order.iterator.map { case (n, t) =>
      StructField(n, t, nullable = true)
    }.toSeq)
  }

  /** Steps 1–3 above: discover per-generation schemas, widen-merge, read
    * the whole set as one scan under the merged schema.
    */
  def normalizedRead(spark: SparkSession, genDirs: Seq[String]): DataFrame = {
    val target = widenMerge(genDirs.map(d => spark.read.parquet(d).schema))
    spark.read.schema(target).parquet(genDirs: _*)
  }

  /** Registry query (oracle-checked): build a two-generation drifted
    * directory from `orders` — generation 1 (even keys) is the early
    * producer with an INT32 `o_orderkey` and no `o_orderpriority`;
    * generation 2 (odd keys) the evolved one with BIGINT keys and the
    * added column — then normalize the mixed directory back into one
    * DataFrame via [[normalizedRead]]. The DuckDB oracle computes the
    * same union straight from the source table (generation membership is
    * the key's parity, so `o_orderpriority` is NULL exactly on even
    * keys), making the hash match prove the drift normalization is
    * value-exact, not just count-preserving.
    *
    * Scale shape: the writes are plain distributed `df.write`; discovery
    * reads one footer per generation; the read-back is ONE
    * FileSourceScan over both directories (PlanSpec pins scan count and
    * the widened BIGINT read schema).
    */
  def scanSchemaDrift(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.table(spark, dir, "orders")
    val base = RoundTrip.scratch(spark, "drift", dir)
    // plain gen1/gen2 subdir names, NOT `gen=1`: a key=value layout would
    // trigger partition-column inference on the read side and smuggle a
    // synthetic column into the drift demonstration
    val g1 = s"$base/gen1"
    val g2 = s"$base/gen2"
    src.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").cast("int").as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").parquet(g1)
    src.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(g2)
    normalizedRead(spark, Seq(g1, g2))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
  }
}
