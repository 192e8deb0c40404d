package graft

import org.apache.spark.sql.functions._
import graft.sources.Jsonl

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("docs: declared schema, missing fields null, corrupt flagged") {
    val out = Jsonl.docs(spark, Jsonl.fixtureLines.toDS())
      .as[(Option[Long], Option[String], Option[String], Option[String],
        Boolean)]
      .collect().sortBy(_._1.getOrElse(Long.MaxValue))
    assert(out === Array(
      (Some(1L), Some("hello world"), Some("en"), Some("web"), false),
      (Some(2L), Some("guten tag"), Some("de"), Some("book"), false),
      (Some(3L), Some("bonjour"), Some("fr"), None, false),
      (None, None, None, None, true)))
  }

  test("readDocs keeps the raw malformed line in the capture column") {
    val corrupt = Jsonl.readDocs(spark, Jsonl.fixtureLines.toDS())
      .filter(col("__graft_corrupt").isNotNull)
      .select(col("__graft_corrupt")).as[String].collect()
    assert(corrupt === Array(Jsonl.fixtureLines.last))
  }

  test("a well-formed line with a literal _corrupt key parses clean") {
    val lines = Seq(
      """{"doc_id": 7, "text": "x", "lang": "en", "source": "s",""" +
        """ "_corrupt": "red herring"}""").toDS()
    val r = Jsonl.docs(spark, lines).head()
    assert(r.getAs[Long]("doc_id") === 7L)
    assert(!r.getAs[Boolean]("is_corrupt"))
  }

  test("parsing is schema-declared, not inferred: extra fields ignored") {
    val lines = Seq(
      """{"doc_id": 9, "text": "x", "lang": "en", "source": "s",""" +
        """ "extra": 42}""").toDS()
    val r = Jsonl.docs(spark, lines).head()
    assert(r.getAs[Long]("doc_id") === 9L)
    assert(!r.getAs[Boolean]("is_corrupt"))
  }
}
