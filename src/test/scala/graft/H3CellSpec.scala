package graft

import org.apache.spark.sql.functions._
import graft.functions.H3Cell

/** Bit-algebra checks against published H3 index facts:
  *   - 8928308280fffff — res-9 cell (base cell 20), the H3 docs'
  *     quickstart example
  *   - 85283473fffffff — res-5 cell
  *   - 8075fffffffffff — res-0 cell, base cell 58
  *   - 8009fffffffffff — res-0 PENTAGON cell (base cell 4)
  */
class H3CellSpec extends SparkSpec {
  import spark.implicits._

  private def one(h3: String, c: org.apache.spark.sql.Column) =
    Seq(h3).toDF("h").select(c).head()

  test("parse/resolution/baseCell decode the published layout") {
    val cells = Seq(
      ("8928308280fffff", 9L, 20L),
      ("85283473fffffff", 5L, 20L),
      ("8075fffffffffff", 0L, 58L),
      ("8009fffffffffff", 0L, 4L)).toDF("h", "res", "base")
    val decoded = cells.select(
      col("res"), col("base"),
      H3Cell.resolution(H3Cell.parse(col("h"))).as("res2"),
      H3Cell.baseCell(H3Cell.parse(col("h"))).as("base2"),
      H3Cell.isValid(H3Cell.parse(col("h"))).as("ok")).collect()
    decoded.foreach { r =>
      assert(r.getLong(2) === r.getLong(0), r.toString)
      assert(r.getLong(3) === r.getLong(1), r.toString)
      assert(r.getBoolean(4), s"$r should be valid")
    }
  }

  test("invalid indexes are rejected structurally") {
    // garbage string → parse null → invalid
    assert(!one("not-a-cell", H3Cell.isValid(H3Cell.parse(col("h"))))
      .getBoolean(0))
    // digit set BELOW the declared resolution must be 7: res 0 with a
    // non-7 first digit
    assert(!one("8075ffffffffffe", H3Cell.isValid(H3Cell.parse(col("h"))))
      .getBoolean(0))
    // base cell 122 out of range (bits 51-45 = 1111010)
    val bad = (1L << 59) | (122L << 45) | ((1L << 45) - 1)
    assert(!Seq(bad).toDF("c").select(H3Cell.isValid(col("c")))
      .head().getBoolean(0))
    // pentagon base cell with leading K-axis digit (digit 1) invalid:
    // take the valid pentagon 8009fffffffffff at res 1 with digit1=1
    val pentaK = ((1L << 59) | (1L << 52) | (4L << 45)
      | (1L << 42) | ((1L << 42) - 1))
    val pentaJ = ((1L << 59) | (1L << 52) | (4L << 45)
      | (2L << 42) | ((1L << 42) - 1))
    val out = Seq((pentaK, pentaJ)).toDF("k", "j")
      .select(H3Cell.isValid(col("k")), H3Cell.isValid(col("j"))).head()
    assert(!out.getBoolean(0), "leading K digit under a pentagon")
    assert(out.getBoolean(1), "leading J digit under a pentagon is fine")
  }

  test("parent truncation: exact bit semantics, monotone, idempotent") {
    val h = "8928308280fffff"
    val p5 = one(h, H3Cell.parentHex(col("h"), 5)).getString(0)
    // parent is a valid res-5 cell of the same base cell
    val props = Seq(p5).toDF("h").select(
      H3Cell.resolution(H3Cell.parse(col("h"))),
      H3Cell.baseCell(H3Cell.parse(col("h"))),
      H3Cell.isValid(H3Cell.parse(col("h")))).head()
    assert(props.getLong(0) === 5L)
    assert(props.getLong(1) === 20L)
    assert(props.getBoolean(2))
    // digits 1..5 unchanged, 6..15 filled with 7
    (1 to 5).foreach { r =>
      assert(one(p5, H3Cell.digit(H3Cell.parse(col("h")), r)).getLong(0)
        === one(h, H3Cell.digit(H3Cell.parse(col("h")), r)).getLong(0))
    }
    (6 to 15).foreach { r =>
      assert(one(p5, H3Cell.digit(H3Cell.parse(col("h")), r)).getLong(0) === 7L)
    }
    // parent at own res = identity; deeper res than the cell = null
    assert(one(h, H3Cell.parentHex(col("h"), 9)).getString(0) === h)
    assert(one("8075fffffffffff", H3Cell.parentHex(col("h"), 3)).isNullAt(0))
  }

  test("hotspotDensityByParent rolls up the inventory without decoding") {
    import graft.sources.{HeliumFixtures, Inventory}
    val inv = Inventory.processInventory(
      Inventory.readCsv(spark, HeliumFixtures.inventoryCsv.toDS()))
    // all three surviving rows differ only in digits 6+ (the varying
    // nibbles sit below bit 30), so one shared res-5 parent...
    val out5 = graft.sources.Inventory.hotspotDensityByParent(inv, 5)
      .collect()
    assert(out5.length === 1)
    assert(out5.head.getLong(1) === 3L)
    assert(out5.head.getLong(2) === 3L) // three distinct owners
    assert(out5.head.getString(0).startsWith("85"))
    // ...while at res 10 hs4 ('...725a4..') splits from hs1/hs2
    val out10 = graft.sources.Inventory.hotspotDensityByParent(inv, 10)
      .orderBy("parent_cell").collect()
    assert(out10.length === 3)
    assert(out10.forall(r => r.getString(0).startsWith("8a")))
  }
}
