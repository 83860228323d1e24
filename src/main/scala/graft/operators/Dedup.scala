package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash-group), exact n-gram Jaccard (inverted shingle index),
  * MinHash+LSH banding (the scale path), and SimHash blocking.
  *
  * Scale design notes (100 TB):
  *  - Nothing here ever cross-joins the corpus. Pair generation always
  *    goes through an inverted index (shingle or LSH bucket) so the
  *    shuffle key is the shingle/bucket, and candidate pairs are a tiny
  *    fraction of n².
  *  - Shingling is relational (posexplode + lead window) and minhash
  *    signatures are a single groupBy with from-the-map-side-combined
  *    `min(xxhash64(seed, shingle))` aggregates — both linear in input
  *    size. (An earlier nested higher-order-function formulation was
  *    quadratic per row: Catalyst inlines the array expression into
  *    every lambda evaluation and HOFs don't codegen. Don't reference
  *    a computed array inside its own transform lambda.)
  *  - Hot shingles (stop-phrases) are the classic skew hazard; cap
  *    them with `maxShingleDocFreq`, which drops shingles whose doc
  *    frequency exceeds the cap before the self-join (standard
  *    practice; similarity then reflects the capped sets).
  */
object Dedup {

  /** Exact duplicate groups by content hash: one row per distinct
    * text, the kept (minimum) id and the copy count.
    */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, shingle) word k-grams, built relationally:
    * posexplode tokens → k−1 lead windows → concat. One shuffle on the
    * id (window partition); dedup via the same aggregation.
    */
  def shingleSets(
      df: DataFrame, idCol: String, tokensCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val words = df.select(col(idCol).as("id"),
      posexplode(col(tokensCol)).as(Seq("pos", "word")))
    val parts = (0 until k).map { i =>
      if (i == 0) col("word") else lead(col("word"), i).over(w)
    }
    words
      .withColumn("shingle",
        when(parts.last.isNotNull, concat_ws(" ", parts: _*)))
      .filter(col("shingle").isNotNull)
      .select(col("id"), col("shingle"))
      .distinct()
  }

  /** Exact all-pairs Jaccard ≥ minJaccard over shingle sets, via the
    * inverted index: join docs that share a shingle, count the
    * intersection, compute |A∩B| / (|A|+|B|−|A∩B|).
    */
  def jaccardPairs(
      shingles: DataFrame,
      minJaccard: Double,
      maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val capped = maxShingleDocFreq match {
      case Some(cap) =>
        val hot = shingles.groupBy(col("shingle"))
          .agg(count(lit(1)).as("df")).filter(col("df") > cap)
          .select("shingle")
        shingles.join(broadcast(hot), Seq("shingle"), "left_anti")
      case None => shingles
    }
    jaccardOf(pairCounts(capped), sizesOf(capped))
      .filter(col("jaccard") >= minJaccard)
  }

  private def sizesOf(shingles: DataFrame): DataFrame =
    shingles.groupBy(col("id")).agg(count(lit(1)).as("n"))

  private def pairCounts(shingles: DataFrame): DataFrame =
    shingles.as("a")
      .join(shingles.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("i"))

  private def jaccardOf(inter: DataFrame, sizes: DataFrame): DataFrame =
    inter
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("n", "nb"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") /
          (col("na") + col("nb") - col("i")).cast("double")).as("jaccard"))

  /** MinHash signatures from a shingle-set DataFrame: one groupBy
    * computing `min(xxhash64(seed, shingle))` for each of
    * bands·rowsPerBand seeds (partial aggregation map-side), then band
    * keys = xxhash64 over each band's row slice.
    * Output: (id, band, key) bucket rows.
    */
  def minhashBuckets(
      shingles: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val numHashes = bands * rowsPerBand
    val mins = (0 until numHashes).map { s =>
      min(xxhash64(lit(s), col("shingle"))).as(s"h$s")
    }
    val sigs = shingles.groupBy(col("id")).agg(mins.head, mins.tail: _*)
    val bandKeys = (0 until bands).map { b =>
      xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(s => col(s"h$s")): _*)
    }
    sigs.select(col("id"), posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
  }

  /** LSH banding: candidate pairs = docs agreeing on at least one
    * band key. The self-join shuffles on (band, key) — never the
    * full corpus.
    */
  def minhashCandidatePairs(
      shingles: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val buckets = minhashBuckets(shingles, bands, rowsPerBand)
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") &&
          col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash dedup, verified: LSH candidates re-checked with exact
    * shingle Jaccard (false positives dropped; per-pair recall is
    * 1−(1−j^r)^b).
    */
  def minhashDedupPairs(
      df: DataFrame, idCol: String, tokensCol: String,
      shingleK: Int, bands: Int, rowsPerBand: Int,
      minJaccard: Double): DataFrame = {
    val sh = shingleSets(df, idCol, tokensCol, shingleK)
    val cands = minhashCandidatePairs(sh, bands, rowsPerBand)
    val inter = pairCounts(sh).join(cands, Seq("id_a", "id_b"), "left_semi")
    jaccardOf(inter, sizesOf(sh)).filter(col("jaccard") >= minJaccard)
  }

  /** 64-bit SimHash over a token multiset (FNV-1a per token, weight =
    * occurrence count). One UDF call per row; no shuffle.
    */
  val simhash64 = udf { tokens: Seq[String] =>
    val acc = new Array[Long](64)
    if (tokens != null) tokens.foreach { t =>
      var h = 0xcbf29ce484222325L // FNV-1a 64
      var i = 0
      while (i < t.length) { h ^= t.charAt(i); h *= 0x100000001b3L; i += 1 }
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, found
    * by 16-bit band blocking (any pair within Hamming ≤ 3 of a 64-bit
    * hash agrees on at least one of 4 bands; wider distances may need
    * more bands — documented approximation).
    */
  def simhashPairs(
      df: DataFrame, idCol: String, tokensCol: String,
      maxHamming: Int): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
      simhash64(col(tokensCol)).as("simhash"))
    val banded = hashed.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map { b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))
      }: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        call_function("bit_count",
          col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
