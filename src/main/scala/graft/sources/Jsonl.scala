package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines document source — the de-facto interchange format of
  * LLM training corpora (one JSON object per line). The reference has
  * no JSONL path (its sources are JSON-RPC and CSV, SURVEY §2.1); this
  * is additive §2.12 surface, built the same way as
  * [[Inventory.readCsv]]: a DECLARED schema (never inference — a
  * schema-inference pass is a full extra read of 100 TB and makes the
  * result depend on which files were sampled) over an injectable line
  * source, so tests and the gate feed in-memory fixtures while
  * production reads `spark.read.text(path)` lines or .json files
  * directly.
  *
  * Malformed lines follow Spark's PERMISSIVE contract: the parsed
  * columns come back null and the raw line is captured in the
  * `__graft_corrupt` column (a reserved name an input object will not
  * carry — a plain `_corrupt` key in a WELL-FORMED line would
  * populate the capture column and flag the line corrupt despite
  * parsing cleanly) — [[docs]] folds that into an `is_corrupt` flag
  * so a curation pipeline can count/quarantine bad records instead of
  * failing the job (FAILFAST) or silently dropping them (DROPMALFORMED)
  * — at corpus scale there is ALWAYS a bad line.
  *
  * Scale shape: json parsing is row-local inside the scan (JacksonParser
  * per partition, whole-stage codegen around it); no shuffle anywhere.
  */
object Jsonl {

  /** Declared schema of a documents-table JSONL line, plus the
    * PERMISSIVE corrupt-record capture column.
    */
  val docSchema: StructType = new StructType()
    .add("doc_id", LongType)
    .add("text", StringType)
    .add("lang", StringType)
    .add("source", StringType)
    .add("__graft_corrupt", StringType)

  /** Parse JSONL lines with the declared schema; corrupt lines keep
    * their raw text in `__graft_corrupt`.
    */
  def readDocs(spark: SparkSession, lines: Dataset[String]): DataFrame =
    spark.read.schema(docSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "__graft_corrupt")
      .json(lines)

  /** The curated view: parsed fields plus `is_corrupt` (true = the
    * line failed to parse; parsed fields are then null).
    */
  def docs(spark: SparkSession, lines: Dataset[String]): DataFrame =
    readDocs(spark, lines)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("__graft_corrupt").isNotNull.as("is_corrupt"))

  /** In-code JSONL fixture (the h-fixture pattern): three well-formed
    * lines — one with a missing optional field — and one malformed
    * line. Shared verbatim by the j01 gate and its VALUES oracle.
    */
  val fixtureLines: Seq[String] = Seq(
    """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}""",
    """{"doc_id": 2, "text": "guten tag", "lang": "de", "source": "book"}""",
    """{"doc_id": 3, "text": "bonjour", "lang": "fr"}""",
    """{"doc_id": 4, "text": "truncated""")
}
