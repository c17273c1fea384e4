package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.sources.Tables.table

/** Throwaway diagnostic: micro-times the shingle pass of dedupMinhash.
  * Usage: runMain graft.MinhashProf [sfDir]
  */
object MinhashProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.engine.GraftSession.getOrCreate("graft-minhash-prof")
    graft.functions.GraftFunctions.register(s)
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(-1L)
          if (ms > 300) println(
            f"[stage] ${i.stageId}%4d ${ms / 1000.0}%6.2f s tasks=${i.numTasks}%4d ${i.name.take(90)}")
        }
      })

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }

    val docsRaw = table(s, dir, "documents")
    time("warmup count")(docsRaw.count())
    time("sum(length(text))")(
      docsRaw.select(sum(length(col("text")))).collect()(0).getLong(0))
    time("split only")(
      docsRaw.select(sum(size(split(col("text"), "\\s+")))).collect()(0).getLong(0))
    time("split(trim(lower))")(
      docsRaw.select(sum(size(split(trim(lower(col("text"))), "\\s+"))))
        .collect()(0).getLong(0))
    time("tokens (array_remove)")(
      docsRaw.select(sum(size(T.tokens(col("text"))))).collect()(0).getLong(0))
    time("word_shingles expr")(
      docsRaw.select(sum(size(T.wordShingles(col("text"), 3))))
        .collect()(0).getLong(0))
    time("explode+hash+count")(
      docsRaw.select(col("doc_id"),
          explode(T.wordShingles(col("text"), 3)).as("sh"))
        .select(xxhash64(col("sh")).as("h0"))
        .filter(col("h0") =!= 0L).count())
    val minAggs = (0 until 64).map(i =>
      min(xxhash64(col("h0"), lit(i))).as(s"h$i"))
    val sigs = docsRaw
      .select(col("doc_id"), explode(T.wordShingles(col("text"), 3)).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h0"))
      .groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
    time("sigs 64-agg")(sigs.count())
    time("full dedupMinhash")(graft.operators.Dedup.dedupMinhash(s, dir)
      .write.format("noop").mode("overwrite").save())
    time("full dedupSimhash")(graft.operators.Dedup.dedupSimhash(s, dir)
      .write.format("noop").mode("overwrite").save())
    time("full dedupNgram")(graft.operators.Dedup.dedupNgramJaccard(s, dir)
      .write.format("noop").mode("overwrite").save())
    time("ngram pairs only")(graft.operators.Dedup
      .dedupNgramJaccard(s, dir).count())
    time("full dedupClusters")(graft.operators.Dedup.dedupClusters(s, dir)
      .write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
