package graft

import org.apache.spark.sql.functions._
import graft.sources.{HeliumFixtures, Inventory}

class InventorySpec extends SparkSpec {
  import spark.implicits._

  private lazy val inv = Inventory.processInventory(
    Inventory.readCsv(spark, HeliumFixtures.inventoryCsv.toDS()))

  test("P7: rows with any null source column are dropped") {
    assert(inv.count() === 3) // hs3 has no location
    assert(inv.filter(col("_key") === "hs3").count() === 0)
  }

  test("F2: _key/_id reference-key columns") {
    val r = inv.filter(col("_key") === "hs1").head()
    assert(r.getAs[String]("_id") === "hotspots/hs1")
    assert(r.getAs[String]("name") === "happy-fox")
  }

  test("F6: GeoJSON point struct with [lng, lat] in valid ranges") {
    val geo = inv.select(col("location_geo.type"),
      col("location_geo.coordinates")).as[(String, Seq[Double])].collect()
    assert(geo.forall(_._1 === "Point"))
    geo.map(_._2).foreach { case Seq(lng, lat) =>
      assert(lng >= -180 && lng <= 180 && lat >= -90 && lat <= 90)
    }
    // deterministic: same index → same point
    val again = Inventory.processInventory(
      Inventory.readCsv(spark, HeliumFixtures.inventoryCsv.toDS()))
      .filter(col("_key") === "hs1")
      .select(col("location_geo.coordinates")).as[Seq[Double]].head()
    val first = inv.filter(col("_key") === "hs1")
      .select(col("location_geo.coordinates")).as[Seq[Double]].head()
    assert(again === first)
  }

  test("F6 fallback: null/garbage H3 index decodes to (0,0)") {
    assert(Inventory.stubDecoder("not-hex") === ((0.0, 0.0)))
    assert(Inventory.stubDecoder("") === ((0.0, 0.0)))
  }

  test("F3: inventory height parses from the snapshot filename") {
    assert(Inventory.heightFromFilename(HeliumFixtures.inventoryCsvName)
      === Some(1234567L))
    assert(Inventory.heightFromFilename("bogus.csv") === None)
  }

  test("live fetch: index JSON → snapshot CSV → same vertices + height") {
    StubNode.withServer() { endpoint =>
      val (lines, height) = Inventory.fetchLatest(spark,
        s"${endpoint}inventories/latest.json")
      assert(height === Some(1234567L))
      val live = Inventory.processInventory(
        Inventory.readCsv(spark, lines))
      assert(live.collect().map(_.toSeq).toSet ===
        inv.collect().map(_.toSeq).toSet)
    }
  }
}
