package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ×N corpus builder for the scale-curve measurement (SCALING.md): turns
  * the sf0.1 testdata into an sf1-equivalent copy by stacking N
  * key-shifted generations of the big tables, so the expensive operator
  * families can be timed at two scales and their growth curves measured
  * instead of argued.
  *
  * Generation design — the point is that the ×N corpus has the SAME
  * statistical shape as the base, just N times more of it, so a measured
  * ratio isolates engine scaling from data-shape drift:
  *
  *  - `orders`/`lineitem`: order keys shift by `g * 1_000_000` per
  *    generation (far above the base max 149,999), so key cardinality
  *    scales ×N while every intra-order join (lineitem↔orders) keeps its
  *    exact fan-out. Dimension keys (partkey/suppkey/custkey) stay as-is:
  *    dims are fixed-size in a star schema, so each dim key now matches
  *    N× more facts — exactly what growing a fact table against fixed
  *    dimensions does.
  *  - `documents`: doc_id shifts by `g * 100_000`; generation g>0 text
  *    replaces every 5th token (offset by g) with a generation-salted
  *    token derived from the original. Within a generation the base
  *    corpus's near-duplicate structure is preserved verbatim (both
  *    members of a dup pair get the same perturbation pattern), while
  *    across generations nearly every shingle differs — so dedup finds
  *    the same cluster-size distribution over an N× corpus, not N-sized
  *    artificial clusters that would turn pair generation quadratic for
  *    data-shape reasons, not engine reasons.
  *  - `embeddings`: vec_id shifts by `g * 100_000`; generation g>0
  *    rotates the 64-dim vector left by g positions. Rotation preserves
  *    norms and pairwise distances WITHIN a generation (neighborhood
  *    structure intact) while decorrelating generations from each other —
  *    ANN at ×N sees N× more points with the base corpus's geometry.
  *  - small dims (`region nation customer supplier part`) and `events`
  *    copy verbatim: fixed-size at any fact scale.
  *
  * All transforms are deterministic — two builds of the same (src, N)
  * produce byte-identical row sets.
  */
object ScaleCorpus {

  val OrderKeyStride = 1000000L
  val DocKeyStride = 100000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_scale10")
    val gens = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, src, dst, gens)
    spark.stop()
  }

  def build(spark: SparkSession, src: String, dst: String,
            gens: Int): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    val fs = dstPath.getFileSystem(conf)
    fs.mkdirs(dstPath)
    // fixed-size tables: verbatim copies
    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      val from = new org.apache.hadoop.fs.Path(s"$src/$t.parquet")
      val to = new org.apache.hadoop.fs.Path(s"$dst/$t.parquet")
      if (fs.exists(to)) fs.delete(to, true)
      org.apache.hadoop.fs.FileUtil.copy(
        from.getFileSystem(conf), from, fs, to, false, conf)
    }
    def gened(df: DataFrame): DataFrame =
      df.withColumn("g", explode(expr(s"sequence(0L, ${gens - 1}L)")))

    def write(df: DataFrame, name: String, files: Int): Unit =
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")

    // events scale by USER generations: ids shift per generation, so
    // each generation carries the base population's exact per-user
    // session/funnel structure at the same timestamps — N× users, not
    // N×-longer histories (which would change windowing semantics).
    // Read through Tables.events so the TIMESTAMP(NANOS) physical type
    // normalizes; the written copy is MICROS, a generation drift every
    // events consumer already handles.
    val events = graft.sources.Tables.events(spark, src)
    write(gened(events)
      .withColumn("event_id", col("event_id") + col("g") * 1000000L)
      .withColumn("user_id", col("user_id") + col("g") * 100000L)
      .drop("g"), "events", math.max(2, gens / 2))

    val orders = spark.read.parquet(s"$src/orders.parquet")
    write(gened(orders)
      .withColumn("o_orderkey", col("o_orderkey") + col("g") * OrderKeyStride)
      .drop("g"), "orders", math.max(2, gens))

    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    write(gened(lineitem)
      .withColumn("l_orderkey", col("l_orderkey") + col("g") * OrderKeyStride)
      .drop("g"), "lineitem", math.max(4, 2 * gens))

    val documents = spark.read.parquet(s"$src/documents.parquet")
    write(gened(documents)
      .withColumn("doc_id", col("doc_id") + col("g") * DocKeyStride)
      .withColumn("text", expr(
        """IF(g = 0, text,
          |   array_join(transform(split(text, ' '),
          |     (t, i) -> IF((i + g) % 5 = 0,
          |                  concat('w', g, substring(t, 1, 3)), t)),
          |   ' '))""".stripMargin))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("g"), "documents", math.max(2, gens))

    val embeddings = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = 64
    // rotation index wraps at the dimension; generations past dim-1
    // additionally negate a g-dependent prefix (norm- and
    // intra-generation-distance-preserving, like the rotation) so no
    // generation ever replicates another's vectors exactly
    write(gened(embeddings)
      .withColumn("vec_id", col("vec_id") + col("g") * DocKeyStride)
      .withColumn("_r", (col("g") % dim).cast("int"))
      .withColumn("_neg", (col("g") / dim).cast("int") % (dim + 1))
      .withColumn("embedding", expr(
        s"""IF(g = 0, embedding,
           |   transform(
           |     concat(slice(embedding, _r + 1, $dim - _r),
           |            slice(embedding, 1, _r)),
           |     (x, i) -> IF(i < _neg, -x, x)))""".stripMargin))
      .drop("g", "_r", "_neg"), "embeddings", math.max(2, gens / 2))
  }
}
