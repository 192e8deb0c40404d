package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 1),
    (4L, Array(0.95f, 0.05f, 0.0f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("knnBrute: self excluded, nearest first, ranks contiguous") {
    val out = Similarity.knnBrute(emb, 1, 4)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(out.map(_._2).take(2) === Array(4L, 1L)) // closest to e0
    assert(out.map(_._4) === Array(1, 2, 3, 4))
    assert(out.forall(_._2 != 0L))
    val sims = out.map(_._3)
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("knnBucketed only scores candidates sharing the sign bucket") {
    val out = Similarity.knnBucketed(emb, 1, 4)
      .as[(Long, Long, Double, Int)].collect()
    // query 0 has bucket 0b0001; vec 3 (negative x) is bucket 0 → excluded
    assert(!out.map(_._2).contains(3L))
    assert(out.map(_._2).toSet.subsetOf(Set(1L, 2L, 4L)))
  }

  test("IVF search: sound restriction of brute force, reasonable recall") {
    val real = table("embeddings")
    val brute = Similarity.knnBrute(real, 10, 1)
      .select("q_id", "sim").as[(Long, Double)].collect().toMap
    val ivf = Similarity.knnIvf(real, 10, 1, nCells = 8, nProbe = 4)
      .select("q_id", "sim").as[(Long, Double)].collect().toMap
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, s) =>
      assert(s <= brute(q) + 1e-12, s"query $q: ivf beat exact")
    }
    // probing half the cells should recover the exact top-1 often
    val hits = ivf.count { case (q, s) => math.abs(s - brute(q)) < 1e-12 }
    assert(hits >= 3, s"IVF top-1 recall too low: $hits/10")
  }

  test("knnIvfDeterministic: sound restriction, partition-independent") {
    val real = table("embeddings")
    val brute = Similarity.knnBrute(real, 10, 1)
      .select("q_id", "sim").as[(Long, Double)].collect().toMap
    val det = Similarity.knnIvfDeterministic(real, 10, 1)
      .select("q_id", "nbr_id", "sim").as[(Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    assert(det.nonEmpty)
    det.foreach { case (q, _, s) =>
      assert(s <= brute(q) + 1e-12, s"query $q: ivf beat exact")
    }
    // the hash-seeded quantizer must give IDENTICAL results under any
    // input partitioning — that's the whole point of the oracle gate
    val again = Similarity.knnIvfDeterministic(real.repartition(13), 10, 1)
      .select("q_id", "nbr_id", "sim").as[(Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    assert(det.toSeq === again.toSeq)
  }

  test("quantizeInt8: bounded reconstruction error, zero-vector safe") {
    val emb = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f), 0),
      (1L, Array(0.0f, 0.0f, 0.0f), 0) // all-zero: scale 0, no NaN
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.quantizeInt8(emb)
      .orderBy("vec_id")
      .select("vec_id", "scale", "q_csv")
      .as[(Long, Double, String)].collect()
    assert(out(1) === ((1L, 0.0, "0,0,0")))
    val (_, scale, csv) = out(0)
    assert(scale === 1.0)
    val q = csv.split(",").map(_.toLong)
    assert(q.toSeq === Seq(64L, -127L, 32L)) // floor(x·127+0.5)
    // dequantized error ≤ half a quantization step per component
    val orig = Seq(0.5, -1.0, 0.25)
    q.zip(orig).foreach { case (qi, x) =>
      assert(math.abs(qi * scale / 127.0 - x) <= scale / 254.0 + 1e-12)
    }
  }

  test("bucketed results are a sound restriction of brute force") {
    val real = table("embeddings")
    val brute = Similarity.knnBrute(real, 5, 1)
      .select("q_id", "sim").as[(Long, Double)].collect().toMap
    val bucketed = Similarity.knnBucketed(real, 5, 1)
      .select("q_id", "sim").as[(Long, Double)].collect().toMap
    assert(bucketed.nonEmpty)
    // the bucket restricts the candidate set, so its best sim can
    // never beat the exact top-1 (and equals it when recall hits)
    bucketed.foreach { case (q, s) =>
      assert(s <= brute(q) + 1e-12, s"query $q: bucketed $s > brute")
    }
  }
}
