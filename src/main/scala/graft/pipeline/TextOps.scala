package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data text operators over the `documents`/webtext tables:
  * deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), language
  * ID, quality scoring, token counting, document fingerprinting.
  *
  * Everything is built from codegen'd Spark SQL functions — no UDFs in
  * the exact-dedup/quality/token paths; MinHash/SimHash use
  * higher-order array functions (`transform`/`aggregate`) which stay in
  * the JVM. Oracles for the SQL-expressible subset live in
  * SparkEntry.oracleSql.
  */
object TextOps {

  // ----------------------------------------------------------- exact dedup

  /** Exact dedup on text content: keep the smallest doc_id per distinct
    * text, count duplicates. Map-side partial agg, one shuffle on the
    * (hashed) text. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("dup_count"))
      .select(col("keep_doc_id"), col("dup_count"))

  // ----------------------------------------------------------- shingles & hashes

  /** word k-shingles of the lowercased text. */
  def shingles(text: Column, k: Int = 3): Column = {
    val words = split(lower(text), "\\s+")
    // array of space-joined k-grams; empty when fewer than k words
    filter(
      transform(sequence(lit(0), greatest(size(words) - k, lit(0))),
        i => when(i + k <= size(words), concat_ws(" ", slice(words, i + 1, lit(k))))),
      c => c.isNotNull)
  }

  /** deterministic 64-bit-ish hash of a string column (xxhash64). */
  def h64(c: Column, seed: Int): Column = xxhash64(c, lit(seed))

  /** MinHash signature: for each of `perms` hash seeds, the minimum
    * shingle hash. Returns array<bigint> of length perms. */
  def minhashSignature(text: Column, k: Int = 3, perms: Int = 16): Column = {
    val sh = shingles(text, k)
    array((0 until perms).map { s =>
      array_min(transform(sh, x => xxhash64(x, lit(s))))
    }: _*)
  }

  /** MinHash-LSH candidate pairs: band the signature, bucket-join on
    * (band index, band hash), dedup pairs. bands*rowsPerBand = perms. */
  def minhashCandidates(docs: DataFrame, k: Int = 3, perms: Int = 16, bands: Int = 4): DataFrame = {
    val rowsPerBand = perms / bands
    val sig = docs.select(col("doc_id"), minhashSignature(col("text"), k, perms).as("sig"))
    val banded = sig.select(col("doc_id"), posexplode(
      array((0 until bands).map(b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b))): _*))
      .as(Seq("band", "bandhash")))
    val a = banded.withColumnRenamed("doc_id", "doc_a")
    val b = banded.withColumnRenamed("doc_id", "doc_b")
    a.join(b, Seq("band", "bandhash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** SimHash (64-bit) over word hashes: sign-sum of bits weighted by
    * occurrence. Computed with bit arithmetic in SQL expressions. */
  def simhash(text: Column): Column = {
    val words = split(lower(text), "\\s+")
    val hashes = transform(words, w => xxhash64(w))
    // for each bit position, majority vote; build via 64 aggregate terms
    val bitCols = (0 until 64).map { b =>
      // sum over words of (bit set ? 1 : -1)
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** n-gram (character trigram) Jaccard similarity between two text cols. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    def grams(c: Column) = array_distinct(
      transform(sequence(lit(1), greatest(length(c) - (n - 1), lit(1))),
        i => c.substr(i, lit(n))))
    val ga = grams(a); val gb = grams(b)
    val inter = size(array_intersect(ga, gb)).cast("double")
    val uni = size(array_union(ga, gb)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  // ----------------------------------------------------------- language ID

  /** Tiny stopword-count language classifier (en/de/fr/es heuristic):
    * the language whose marker words occur most often. Deterministic,
    * SQL-expressible (oracle mirrors it). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "es" -> Seq(" el ", " y ", " los "))

  private def countOcc(text: Column, token: String): Column =
    ((length(text) - length(regexp_replace(text, token, ""))) / token.length).cast("long")

  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    langMarkers.toSeq.sortBy(_._1).map { case (lang, toks) =>
      lang -> toks.map(t => countOcc(padded, t)).reduce(_ + _)
    }
  }

  /** predicted language code (ties -> lexicographically first, 'und' if
    * all scores zero). Adds `outCol` to df. The marker scores are
    * materialized in a separate projection first: inlining them into the
    * argmax when-chain replicates each (regexp-heavy) score expression
    * ~9x and blew query time up by >100x in benchmarks. */
  def withLangId(df: DataFrame, textCol: Column, outCol: String): DataFrame = {
    val scores = langScores(textCol)
    val scored = scores.foldLeft(df) { case (d, (lang, s)) => d.withColumn(s"__score_$lang", s) }
    val best = scores.map { case (l, _) => col(s"__score_$l") }.reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, _)) =>
      when(col(s"__score_$lang") === best && best > 0, lit(lang)).otherwise(acc)
    }
    scored.withColumn(outCol, pick).drop(scores.map(s => s"__score_${s._1}"): _*)
  }

  // ----------------------------------------------------------- quality & tokens

  /** whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0L).otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** quality features: length, token count, mean word length, digit and
    * punctuation ratios, stopword ratio; plus a single scalar score. */
  def qualityFeatures(docs: DataFrame): DataFrame = {
    val t = col("text")
    val toks = tokenCount(t)
    val digits = (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "[\\.,;:!\\?]", ""))).cast("double")
    val stop = countOcc(concat(lit(" "), lower(t), lit(" ")), " the ") +
      countOcc(concat(lit(" "), lower(t), lit(" ")), " and ")
    docs.select(
      col("doc_id"),
      length(t).cast("long").as("n_chars"),
      toks.as("n_tokens"),
      (length(t).cast("double") / greatest(toks, lit(1L))).as("mean_tok_len"),
      (digits / greatest(length(t), lit(1)).cast("double")).as("digit_ratio"),
      (punct / greatest(length(t), lit(1)).cast("double")).as("punct_ratio"),
      (stop.cast("double") / greatest(toks, lit(1L))).as("stopword_ratio"))
  }

  /** Rolling FNV-1a fingerprint of the text: order-sensitive content
    * hash usable for near-identity checks. Scala UDF (wrapping 64-bit
    * multiply — Spark 4's ANSI mode forbids overflow in SQL arithmetic). */
  private val fpUdf = udf((text: String) => {
    var h = 1469598103934665603L
    if (text != null) {
      var i = 0
      while (i < text.length) { h = (h ^ text.charAt(i).toLong) * 1099511628211L; i += 1 }
    }
    h
  })
  def fingerprint(text: Column): Column = fpUdf(text)
}
