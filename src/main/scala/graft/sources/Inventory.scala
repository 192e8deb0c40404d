package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gateway-inventory dimension pipeline (SURVEY.md §2.1 S4, §3.2,
  * §7.2 C; reference loaders.py:10-47): CSV snapshot → hotspot vertex
  * collection with `_id`/`_key` and a GeoJSON point derived from the
  * H3 index.
  *
  * The H3 cell→centroid decode (F6) is a pluggable seam: no H3 jar
  * exists in the offline image and the full icosahedral projection is
  * out of scope (SURVEY §7.4(1)), so the default is a deterministic
  * stub mapping the index's 64-bit value into valid lat/lng ranges —
  * same nullability/fallback contract as the reference (loaders.py:
  * 13-16: bad/absent index → [0,0]). A real decoder (e.g. the public
  * h3-java cellToLatLng) drops into `h3ToGeo` unchanged.
  *
  * Scale: the dimension is bounded (~1M rows) — always broadcastable;
  * the snapshot write is a full replace (S6), refresh-triggered by the
  * cursor lag rule (T6, follower.py:61-62).
  */
object Inventory {

  /** Explicit schema — the one inferred-schema input in the reference
    * (pandas read_csv) gets a declared schema here (SURVEY §2.1 S4).
    */
  val csvSchema: StructType = StructType(Seq(
    StructField("address", StringType, nullable = false),
    StructField("owner", StringType, nullable = true),
    StructField("location", StringType, nullable = true), // H3 index
    StructField("name", StringType, nullable = true)))

  /** Pluggable H3 seam: index string → (lat, lng). */
  type H3Decoder = String => (Double, Double)

  /** Deterministic stand-in for the real H3 centroid decode: folds the
    * index into valid coordinate ranges. Null/unparsable → (0,0),
    * matching the reference's TypeError fallback.
    */
  val stubDecoder: H3Decoder = { h3 =>
    try {
      val v = java.lang.Long.parseUnsignedLong(h3.trim, 16)
      val lat = (Math.floorMod(v, 180000L) / 1000.0) - 90.0
      val lng = (Math.floorMod(v / 180000L, 360000L) / 1000.0) - 180.0
      (lat, lng)
    } catch { case _: RuntimeException => (0.0, 0.0) }
  }

  /** F6 as a column: GeoJSON Point struct {type, coordinates:[lng,lat]}
    * (loaders.py:16 — longitude first, GeoJSON convention).
    */
  def geoColumn(h3Index: Column, decoder: H3Decoder = stubDecoder): Column = {
    val decode = udf { h3: String =>
      val (lat, lng) = decoder(if (h3 == null) "" else h3)
      Seq(lng, lat)
    }
    struct(lit("Point").as("type"),
      decode(h3Index).as("coordinates"))
  }

  /** loaders.py:24-37: add `_key`/`_id` (F2), derive the geo point
    * (F6), then drop rows with ANY null source column (P7 — the
    * reference's dropna runs after the derived columns, so a null H3
    * index still drops the row even though its geo fell back to 0,0).
    */
  def processInventory(csv: DataFrame,
                       decoder: H3Decoder = stubDecoder): DataFrame =
    csv
      .na.drop("any", csvSchema.fieldNames)
      .select(
        col("address").as("_key"),
        concat(lit("hotspots/"), col("address")).as("_id"),
        col("address"), col("owner"), col("location"), col("name"),
        geoColumn(col("location"), decoder).as("location_geo"))

  /** Read a CSV snapshot with the declared schema (header skipped). */
  def readCsv(spark: SparkSession, lines: Dataset[String]): DataFrame =
    spark.read.schema(csvSchema).option("header", "true").csv(lines)

  /** Default GET transport: JDK HttpClient (the GET twin of
    * JsonRpcClient.httpPost, same injectable seam).
    */
  def httpGet(url: String): String = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url)).GET().build()
    client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  /** The LIVE inventory path (loaders.py:22-26): GET the index JSON,
    * follow its `gateway_inventory` URL to the latest snapshot CSV,
    * return the parsed lines plus the inventory height recovered from
    * the snapshot filename (F3, loaders.py:45).
    *
    * Driver-side single fetch by design, like the reference: the
    * dimension snapshot is bounded (~1M rows) and arrives as ONE file
    * behind a URL — there is nothing to fan out. Relative snapshot
    * URLs resolve against the index URL. Deviation (documented): the
    * reference downloads a .csv.gz through pandas; the seam here hands
    * back text lines, so transport-level gzip is the `get` function's
    * concern.
    */
  def fetchLatest(spark: SparkSession, indexUrl: String,
                  get: String => String = httpGet)
      : (Dataset[String], Option[Long]) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val node = mapper.readTree(get(indexUrl)).get("gateway_inventory")
    require(node != null, s"no gateway_inventory entry at $indexUrl")
    val csvUrl = node.asText()
    val resolved = java.net.URI.create(indexUrl).resolve(csvUrl).toString
    val height = heightFromFilename(resolved.split("/").last)
    import spark.implicits._
    val lines = get(resolved).split("\r?\n").toIndexedSeq
      .filter(_.nonEmpty).toDS()
    (lines, height)
  }

  /** F3: inventory height from the snapshot filename
    * (loaders.py:45 — parse("gateway_inventory_{}.csv.gz")).
    */
  def heightFromFilename(name: String): Option[Long] =
    "gateway_inventory_(\\d+)".r.findFirstMatchIn(name)
      .map(_.group(1).toLong)

  /** Geo rollup by coarser H3 parent cell: hotspot density per
    * `parentRes` cell. THE scale-relevant geo operation — bucketing /
    * rolling up billions of points needs only the exact parent-cell
    * bit truncation (graft.functions.H3Cell), never a centroid
    * decode; one hash aggregate on the truncated cell, no UDF.
    */
  def hotspotDensityByParent(inv: DataFrame, parentRes: Int): DataFrame =
    inv.groupBy(graft.functions.H3Cell.parentHex(col("location"), parentRes)
        .as("parent_cell"))
      .agg(count(lit(1)).as("n_hotspots"),
        countDistinct(col("owner")).as("n_owners"))
}
