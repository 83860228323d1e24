package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (fuzzy entity matching): all
  * unordered pairs of distinct strings with `levenshtein(a, b) <=
  * maxDist`. The declarative form is a cross join with an expensive
  * predicate — O(n²) distance computations — which no optimizer can
  * save; the classic fix (Gravano et al., VLDB 2001) is positional
  * q-gram blocking: an edit operation destroys at most `q`
  * overlapping q-grams, so two strings within distance `k` share at
  * least `max(|a|,|b|) − q + 1 − k·q` q-grams. Candidates are
  * generated from an inverted q-gram index (the same
  * shuffle-by-token shape as the shingle index in
  * [[Dedup.jaccardPairs]]), count-filtered by that lower bound, and
  * only the survivors pay a real `levenshtein` evaluation (Spark's
  * codegen built-in).
  *
  * Scale design (100 TB):
  *  - the only corpus-sized shuffle is keyed by q-gram — never doc ×
  *    doc; per-gram fan-out is bounded by gram selectivity, and the
  *    count-filter groupBy is pair-keyed but only over candidates;
  *  - a length band `|len(a) − len(b)| <= maxDist` prunes inside the
  *    gram bucket before any pair materializes;
  *  - the verify stage is exact, so the result EQUALS the naive cross
  *    join whenever every string has at least `q·(k+1)` characters
  *    (below that the gram lower bound can reach 0 and blocking may
  *    miss pairs) — enforced eagerly with a loud error rather than a
  *    silent recall loss.
  *
  * Output: `(name_a, name_b, dist)` with `name_a < name_b`.
  */
object FuzzyJoin {

  /** All distinct-value pairs of `nameCol` within `maxDist` edits.
    * Input rows with null names are ignored; duplicate values are
    * deduplicated before pairing (the join is over the value domain,
    * not rows).
    */
  def similarPairs(
      names: DataFrame,
      nameCol: String,
      maxDist: Int,
      q: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1: $maxDist")
    require(q >= 1, s"q must be >= 1: $q")
    Reserved.check("names" -> names)

    val distinctNames = names
      .select(col(nameCol).cast("string").as("name"))
      .where(col("name").isNotNull)
      .distinct()

    // Loud completeness guard, evaluated in-line (no extra validation
    // pass over the data): below q·(k+1) chars the q-gram count lower
    // bound degenerates to 0 and blocking could silently drop true
    // pairs — fail the job instead.
    val minLen = q * (maxDist + 1)
    val guarded = distinctNames.select(
      when(length(col("name")) < minLen,
        raise_error(concat(
          lit(s"similarPairs requires names with >= $minLen chars " +
            s"(q=$q, maxDist=$maxDist) for exact q-gram blocking; got: "),
          col("name"))))
        .otherwise(col("name")).as("name"))

    // Positional q-grams, deduplicated per name: the inverted index
    // key. The explode is row-local; the shuffle that follows is keyed
    // by gram.
    val grams = guarded
      .select(col("name"),
        explode(array_distinct(transform(
          sequence(lit(1), length(col("name")) - lit(q - 1)),
          i => col("name").substr(i, lit(q)))))
          .as("__g"))

    val a = grams.select(col("name").as("name_a"), col("__g"))
    val b = grams.select(col("name").as("name_b"), col("__g"))
    val candidates = a.join(b, Seq("__g"))
      .where(col("name_a") < col("name_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .groupBy(col("name_a"), col("name_b"))
      .agg(count(lit(1)).as("__shared"))
      .where(col("__shared") >=
        greatest(length(col("name_a")), length(col("name_b")))
          - lit(q - 1) - lit(maxDist * q))

    // The `when` guard ties the distance expression to the aggregate
    // output column: a bare levenshtein predicate here references only
    // grouping keys, and Catalyst would push it below the aggregate
    // into the gram join — evaluating the verify once per shared-gram
    // OCCURRENCE (before the count filter) instead of once per
    // surviving pair. `__shared >= 0` is vacuously true but not
    // foldable, so the verify stays where the algorithm wants it.
    candidates
      .select(col("name_a"), col("name_b"),
        when(col("__shared") >= 0,
          levenshtein(col("name_a"), col("name_b"))).as("dist"))
      .where(col("dist") <= maxDist)
  }
}
