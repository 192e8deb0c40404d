package graft

import org.apache.spark.sql.functions._
import graft.functions.Canon

class CanonSpec extends SparkSpec {
  import spark.implicits._

  test("hash60 equals base-16 decode of the first 15 md5 hex chars") {
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72 → 0x900150983cd24fb
    val got = Seq("abc").toDF("s")
      .select(Canon.hash60(col("s"))).as[Long].head()
    assert(got === java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("shingles: k-windows in order, empty below k words") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(Canon.shingles(Canon.words(col("text")), 3).as("sh"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) === Seq("a b c", "b c d"))
    assert(rows(1) === Seq.empty)
  }

  test("rollingHash is an order-sensitive left fold") {
    def roll(xs: Seq[Long]): Long =
      xs.foldLeft(0L)((acc, h) => (acc * 31 + h) % Canon.RollMod)
    val df = Seq(Seq(5L, 7L, 11L), Seq(11L, 7L, 5L)).toDF("hs")
      .select(Canon.rollingHash(col("hs"))).as[Long].collect()
    assert(df(0) === roll(Seq(5L, 7L, 11L)))
    assert(df(1) === roll(Seq(11L, 7L, 5L)))
    assert(df(0) !== df(1))
  }

  test("affine family stays in Z_p and differs by seed") {
    val h = Seq(Canon.MersenneP - 1).toDF("h")
    val outs = (0 until 8).map { s =>
      h.select(Canon.affine(s, col("h"))).as[Long].head()
    }
    assert(outs.forall(v => v >= 0 && v < Canon.MersenneP))
    assert(outs.distinct.size === 8)
  }

  test("dot is the exact sequential fold of pairwise products") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .select(Canon.dot(col("a"), col("b"))).as[Double].head()
    assert(df === ((0.0 + 1.0 * 4.0) + 2.0 * 5.0) + 3.0 * 6.0)
  }
}
