package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * - Brute-force cosine top-k: zip_with/aggregate dot products (codegen,
  *   no UDF), a single scan + top-k per query. The exactness baseline.
  * - LSH-bucketed variant (random-hyperplane signs -> bucket equi-join):
  *   the 100TB path — candidates come from a hash-bucket join instead of
  *   a full cross product, then exact cosine re-rank.
  */
object AnnOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** exact top-k most-similar rows to a fixed query vector. */
  def topK(emb: DataFrame, vecCol: String, query: Array[Float], k: Int): DataFrame = {
    val q = typedLit(query.toSeq)
    emb.withColumn("cos_sim", cosine(col(vecCol).cast("array<double>"), q.cast("array<double>")))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** deterministic pseudo-random hyperplane component for (plane p, dim i). */
  private def planeComponent(p: Int, i: Column): Column =
    (pmod(xxhash64(concat_ws(":", lit(p), i)), lit(2001L)).cast("double") - 1000.0) / 1000.0

  /** sign-bit signature of a vector against `planes` hyperplanes. */
  def lshSignature(vec: Column, planes: Int): Column = {
    val v = vec.cast("array<double>")
    (0 until planes).map { p =>
      val proj = aggregate(zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => x * planeComponent(p, i)), lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** All-pairs near-duplicate candidates by embedding: bucket join on the
    * LSH signature (exact-sign match), then exact cosine filter. */
  def nearDupPairs(emb: DataFrame, vecCol: String, idCol: String,
                   planes: Int = 12, minCosine: Double = 0.95): DataFrame = {
    val sig = emb.select(col(idCol), col(vecCol))
      .withColumn("__sig", lshSignature(col(vecCol), planes))
    val a = sig.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"), col("__sig"))
    val b = sig.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"), col("__sig"))
    a.join(b, Seq("__sig"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("vec_a").cast("array<double>"), col("vec_b").cast("array<double>")))
      .filter(col("cos_sim") >= minCosine)
      .select("id_a", "id_b", "cos_sim")
  }
}
