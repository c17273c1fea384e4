package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests pinning the engine's numeric coercion against the
  * reference's lattice (compute_value.rs:350-431): signed/unsigned
  * promotion, int→float widening, both sides cast to the common type
  * before kernels. Spark's Catalyst TypeCoercion is a superset; these
  * properties document the behaviors queries rely on, including the
  * deltas SURVEY.md §7.5 calls out (float literal typing, int division).
  */
class CoercionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Deterministic scalacheck sampling (no scalatest bridge offline). */
  def forAll[A](g: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      g.apply(Gen.Parameters.default, rng.Seed(i.toLong)).foreach(f)
    }
  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 60).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, rng.Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, rng.Seed(i.toLong + 1000))
      } f(a, b)
    }

  val ints: Gen[Int] = Gen.chooseNum(-1000000, 1000000)
  val doubles: Gen[Double] = Gen.chooseNum(-1e6, 1e6)

  test("int + double widens to double (ref: int→float widening)") {
    forAll(ints, doubles) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b").select(($"a" + $"b").as("r"))
      assert(df.schema("r").dataType === DoubleType)
      assert(df.collect()(0).getDouble(0) === a.toDouble + b)
    }
  }

  test("byte/short/int/long comparisons promote to the wider type") {
    forAll(ints) { a =>
      val df = Seq(Tuple1(a.toLong)).toDF("l")
        .select(($"l" > lit(a.toShort)).as("r"),
          ($"l" === lit(a)).as("e"))
      val row = df.collect()(0)
      assert(row.getBoolean(0) === (a.toLong > a.toShort.toLong))
      assert(row.getBoolean(1) === (a.toLong == a.toLong))
    }
  }

  test("division of integers yields double (Spark delta vs C-like refs)") {
    forAll(ints.suchThat(_ != 0), ints) { (a, b) =>
      val df = Seq((b, a)).toDF("b", "a").select(($"b" / $"a").as("r"))
      assert(df.schema("r").dataType === DoubleType)
      assert(df.collect()(0).getDouble(0) === b.toDouble / a.toDouble)
    }
  }

  test("float literal arithmetic matches double semantics (ref prefers f32)") {
    // the reference types small decimal literals as Float32
    // (compute_value.rs:226-232); we deliberately keep Spark's f64 and
    // document the delta — this pins it.
    val df = spark.sql("SELECT 1.5 + CAST(1 AS INT) AS r")
    assert(df.collect()(0).getDecimal(0).doubleValue() === 2.5)
  }

  test("modulo on doubles is fmod (ref kernels::numeric::rem)") {
    forAll(doubles, doubles.suchThat(d => math.abs(d) > 1e-9)) { (a, b) =>
      val r = Seq((a, b)).toDF("a", "b").select(($"a" % $"b").as("r"))
        .collect()(0).getDouble(0)
      assert(r === a % b)
    }
  }

  test("unsigned widening policy: UInt32-range longs survive round-trip") {
    // Spark has no unsigned types; SURVEY.md §1.6 fixes the widening
    // policy (UInt32→Long). Values above Int.MaxValue must be exact.
    forAll(Gen.chooseNum(0L, 4294967295L)) { u =>
      val r = Seq(Tuple1(u)).toDF("u").select(($"u" * 1L).as("r"))
        .collect()(0).getLong(0)
      assert(r === u)
    }
  }

  test("null propagates through arithmetic and comparison (3-valued logic)") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(null.asInstanceOf[java.lang.Double], 1.0)),
      StructType(Seq(StructField("a", DoubleType, nullable = true),
        StructField("b", DoubleType, nullable = false))))
      .select(($"a" + $"b").isNull.as("plus_null"),
        ($"a" > $"b").isNull.as("cmp_null"))
    val row = df.collect()(0)
    assert(row.getBoolean(0) && row.getBoolean(1))
  }
}
