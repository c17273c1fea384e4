package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextFunctions => T}

/** Equivalence fuzz for the codegen'd WordShingles Catalyst expression
  * against the higher-order-function Column formulation it replaced (the
  * expression exists purely for speed — outputs must be bit-identical,
  * including lowercase/trim/empty-token edge semantics and first-
  * occurrence distinct ordering).
  */
class ShingleSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** Deterministic scalacheck sampling (no scalatest bridge offline). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, rng.Seed(i.toLong)))

  /** The pre-round-2 interpreted formulation, verbatim. */
  private def hofShingles(c: org.apache.spark.sql.Column, n: Int) = {
    val t = array_remove(split(trim(lower(c)), "\\s+"), "")
    array_distinct(when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array(concat_ws(" ", t))))
  }

  test("WordShingles matches the replaced HOF formulation on fuzzed text") {
    graft.functions.GraftFunctions.register(spark)
    val word = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("the", "The", "Élan", "ÑOÑO", "x,y.z", "a-b", "", " ",
        "\t", "mixedCASE", "123", "添加数据", "ß"))
    val sep = Gen.oneOf(" ", "  ", "\t", " \n ")
    val textGen = for {
      ws <- Gen.listOf(word)
      s <- sep
    } yield ws.mkString(s)
    val texts = (samples(textGen, 150) ++
      Seq("", " ", "\t\n", "one", "one two", "a a a a a")).distinct
    import spark.implicits._
    val df = texts.toDF("text")
    Seq(2, 3, 8).foreach { n =>
      val mismatched = df
        .select(col("text"), T.wordShingles(col("text"), n).as("fast"),
          hofShingles(col("text"), n).as("ref"))
        .filter(col("fast") =!= col("ref"))
        .collect()
      assert(mismatched.isEmpty,
        s"n=$n first=${mismatched.headOption.mkString}")
    }
  }
}
