package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Log10IDF, StratifiedSplit, TrimmedCountVectorizer}
import org.apache.spark.sql.functions._

/** ML operator queries (SURVEY §2.8) built from the engine's library
  * components: exact stratified split (M1), decision tree + confusion
  * matrix (M3/M4 via TrimmedCountVectorizer A3), k-means (M8), PCA
  * (M10). Only the split is SQL-expressible (its per-class sizes are
  * exactly ceil(p·n)); the trainers get rows-only checks.
  */
object MLQueries {

  val all: Seq[QueryDef] = Seq(

    // M1 — exact stratified 70/30 split, seed 32984 (the reference's
    // createDataPartition seed, R:137). Train size per class is exactly
    // ceil(0.7·n) — which is what makes this oracle-checkable.
    QueryDef(
      "q_split_proportions",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        StratifiedSplit.withSplitFlag(docs, "lang", 0.7, 32984L)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_total"),
            sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
            sum(when(!col("is_train"), 1L).otherwise(0L)).as("n_test"))
          .orderBy(col("lang"))
      },
      Some("""
        SELECT lang, COUNT(*) AS n_total,
               CAST(CEIL(0.7 * COUNT(*)) AS BIGINT) AS n_train,
               COUNT(*) - CAST(CEIL(0.7 * COUNT(*)) AS BIGINT) AS n_test
        FROM documents
        GROUP BY lang
        ORDER BY lang
      """)),

    // M3/M4 — decision-tree classifier on trimmed count vectors
    // (binary: lang == 'en'), stratified split, confusion matrix (A7).
    // rpart semantics honored (R:178): grow deep (maxDepth=8), then
    // weakest-link cost-complexity prune at cp=0.02 (TreePruning) —
    // cp, not a depth cap, is the capacity control, closing SURVEY H2.
    // DuckDB trains no trees; the oracle PINS the sf0.01 fixture's 2×2
    // (the q_pca_variance pinned-constant move). The r14 pin desynced
    // because MLlib's tree fit is partition-layout-dependent (sampled
    // bins + float partial aggregation); the fit here is
    // [[DeterministicCart]] instead — exact integer split statistics,
    // total tie-break order — so every stage of the chain (content-
    // hashed split, tf-desc/term-asc vocabulary, exact CART, exact
    // weakest-link prune) is provably layout-invariant and the pin
    // holds at ANY parallelism (DeterministicCartSpec shuffles the
    // layout and asserts the identical tree). NOTE: re-pin from this
    // query's own output if the fixture ever changes.
    QueryDef(
      "q_confusion",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            TextFunctions.splitWords(col("text")).as("tokens"))
        val cv = new TrimmedCountVectorizer()
          .setInputCol("tokens").setOutputCol("features")
          .setMinDocFreq(2).setMinTermFreq(2)
        val featurized = cv.fit(docs).transform(docs)
          .withColumn("label", (col("lang") === "en").cast("double"))
        // shards pinned (NOT the shuffle-partition default): split
        // MEMBERSHIP depends on the shard count, and this query's
        // oracle pins the 2×2 — membership must be a function of
        // (seed, data) alone, identical at local[4] and local[32].
        val (train, test) =
          StratifiedSplit.split(featurized, "label", 0.7, 32984L,
            shards = 64)
        val fitted = graft.operators.DeterministicCart.fit(
          train, "features", "label", maxDepth = 8)
        val model = graft.operators.TreePruning.pruneCp(fitted, 0.02)
        model.transform(test)
          .groupBy(col("prediction"), col("label"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("prediction"), col("label"))
      },
      Some("""
        SELECT CAST(prediction AS DOUBLE) AS prediction,
               CAST(label AS DOUBLE) AS label,
               CAST(n AS BIGINT) AS n
        FROM (VALUES
          (0.0, 0.0, 56), (0.0, 1.0, 50),
          (1.0, 0.0, 28), (1.0, 1.0, 15)) AS t(prediction, label, n)
        ORDER BY prediction, label
      """)),

    // M5-M7 as vectors — TF (L1) ∘ Log10IDF over trimmed count
    // vectors; returns per-doc L2 norm of the tf-idf vector, which IS
    // SQL-expressible: with the default (1,1) trim the vocabulary is
    // every split token, so the norm is sqrt(Σ ((cnt/doc_total) ·
    // log10(N/df))²) over the q_tfidf cell values. To make the hash
    // order-independent (Spark folds the vector in slot order, DuckDB
    // SUMs in arbitrary order) each cell is snapped to a 1e-9 lattice
    // first; the squares and their sum are then exact integers
    // (DECIMAL in Spark, HUGEINT in DuckDB), so both engines feed the
    // SAME exact value into sqrt (IEEE-correctly-rounded, build
    // independent). Per-cell 9-dp rounding also absorbs libm log10
    // ulps — same policy as q_lm_score's UnigramLM decimal lattice.
    QueryDef(
      "q_tfidf_vectors",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"),
            TextFunctions.splitWords(col("text")).as("tokens"))
        val cv = new TrimmedCountVectorizer()
          .setInputCol("tokens").setOutputCol("counts")
        val counted = cv.fit(docs).transform(docs)
        val tf = new org.apache.spark.ml.feature.Normalizer()
          .setInputCol("counts").setOutputCol("tf").setP(1.0)
          .transform(counted)
        val idf = new Log10IDF().setInputCol("counts").setOutputCol("x")
        // fit on counts (df = nonzero slots), apply to TF vectors
        val idfModel = idf.fit(tf)
        idfModel.setInputCol("tf").setOutputCol("tfidf")
        // L2 norm via the MLlib array bridge + Catalyst aggregate —
        // keeps the norm math codegen'd instead of a Scala UDF. Cells
        // are snapped to integer nanounits (x·1e9, exact in double up
        // to |x| < 2^53/1e9) so the sum of squares is exact DECIMAL
        // arithmetic, immune to fold order.
        idfModel.transform(tf)
          .withColumn("__cells",
            org.apache.spark.ml.functions.vector_to_array(col("tfidf")))
          .select(col("doc_id"),
            round(
              sqrt(expr(
                """CAST(aggregate(__cells, CAST(0 AS DECIMAL(38,0)),
                  |  (acc, x) -> acc
                  |    + CAST(round(x * 1e9) AS DECIMAL(19,0))
                  |    * CAST(round(x * 1e9) AS DECIMAL(19,0)))
                  |  AS DOUBLE)""".stripMargin)) / lit(1e9),
              6).as("tfidf_l2"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH counts AS (
          SELECT doc_id, word, COUNT(*) AS cnt
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents)
          GROUP BY doc_id, word),
        df AS (SELECT word, COUNT(*) AS df FROM counts GROUP BY word),
        tot AS (SELECT doc_id, SUM(cnt) AS tot FROM counts GROUP BY doc_id),
        cells AS (
          SELECT c.doc_id,
                 (CAST(c.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE))
                   * LOG10(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                           / CAST(df.df AS DOUBLE)) AS cell
          FROM counts c
          JOIN tot t ON t.doc_id = c.doc_id
          JOIN df ON df.word = c.word)
        SELECT d.doc_id,
               ROUND(sqrt(CAST(COALESCE(
                       SUM(CAST(ROUND(cell * 1e9) AS HUGEINT)
                           * CAST(ROUND(cell * 1e9) AS HUGEINT)), 0)
                     AS DOUBLE)) / 1e9, 6) AS tfidf_l2
        FROM documents d LEFT JOIN cells ON cells.doc_id = d.doc_id
        GROUP BY d.doc_id
        ORDER BY d.doc_id
      """)),

    // M8 — k-means on the embeddings table: deterministic Lloyd's
    // iterations (k=10, 3 steps) from the sampled-codebook init, all
    // arithmetic on the exact micro lattice, so cluster sizes AND
    // training cost hash-match a generated-CTE DuckDB replay (the
    // q_coreset/q_pagerank unroll precedent — this was a no_oracle
    // row through r12). The reference's nstart=50 best-of-restarts
    // intent stays available via graft.operators.KMeansBestOfSeeds
    // (seeded MLlib k-means||, spec-pinned).
    QueryDef(
      "q_kmeans_cost",
      (s, dir) =>
        graft.operators.LloydKMeans.fitSummary(
            Tables.embeddings(s, dir), "vec_id", "embedding",
            k = 10, iters = 3)
          .orderBy(col("cluster")),
      Some(s"""
        WITH ${lloydCtes(10, 3)}
        SELECT cell AS cluster, COUNT(*) AS size,
               CAST(SUM(dist) AS BIGINT) AS cost_micro2
        FROM af GROUP BY 1
        ORDER BY cluster
      """)),

    // M9 — t-SNE (R:318-322), the real thing rather than the PCA-2D
    // substitute: exact seeded t-SNE (operators.Tsne) over a
    // deterministic content-hash sample. No oracle (500 gradient
    // iterations of coupled float math have no SQL twin); TsneSpec
    // pins cluster preservation and determinism, and the row count +
    // schema are driver-checked.
    QueryDef(
      "q_tsne",
      (s, dir) =>
        graft.operators.Tsne.embedSampled(
            Tables.embeddings(s, dir), "vec_id", "embedding",
            maxRows = 300, perplexity = 25, iterations = 300)
          .orderBy(col("vec_id")),
      None),

    // M10 — standardized PCA explained variance, the DETERMINISTIC
    // spectral path (operators.SpectralPca: exact integer moments →
    // driver-side correlation eigen — a pure function of the parquet
    // bytes, proven repartition-stable). That determinism is what
    // lets the oracle PIN the sf0.01 fixture's spectrum as constants
    // (the q_tokenize_icu shared-constant precedent; this was a
    // no_oracle row through r12) — the driver compare now guards the
    // scan → exact-moments → eigen chain end to end. The MLlib
    // StandardScaler+PCA chain remains the fidelity path in
    // OkCupidPipeline (zero-var guard, quirk Q7). NOTE: the pinned
    // VALUES are the sf0.01 verify fixture's spectrum; re-pin via
    // SpectralPcaSpec's printout if the fixture ever changes.
    QueryDef(
      "q_pca_variance",
      (s, dir) =>
        graft.operators.SpectralPca.explainedVariance(
            Tables.embeddings(s, dir), "vec_id", "embedding", k = 8)
          .orderBy(col("component")),
      Some("""
        SELECT * FROM (VALUES
          (0, 0.027272), (1, 0.026912), (2, 0.026504), (3, 0.025643),
          (4, 0.025003), (5, 0.024863), (6, 0.023848), (7, 0.022975))
          AS t(component, explained_variance)
        ORDER BY component
      """)),

    // Exact ROC AUC on the SAME click-score → purchase framing as
    // q_lift_curve: the threshold-free ranking number — computed via
    // the Mann-Whitney midrank identity without ever forming
    // pos×neg pairs; doubled midranks keep everything exact integers
    // to one micro-edge division, ties handled by definition
    // (Calibration.auc scaladoc).
    QueryDef(
      "q_auc",
      (s, dir) => {
        val users = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "click", 1L)
            .otherwise(0L)).as("score"),
            max(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).as("y"))
          .withColumn("grp", lit("all"))
        graft.operators.Calibration.auc(
          users, "grp", col("y") === 1, "score")
      },
      Some("""
        WITH u AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                          ELSE 0 END) AS BIGINT) AS s,
                 MAX(CASE WHEN event_type = 'purchase' THEN 1
                     ELSE 0 END) AS y
          FROM events GROUP BY 1),
        pv AS (
          SELECT 'all' AS grp, s, CAST(SUM(y) AS BIGINT) AS pv,
                 CAST(count(*) AS BIGINT) AS lv
          FROM u GROUP BY 1, 2),
        m AS (
          SELECT grp, pv, lv,
                 SUM(lv) OVER (PARTITION BY grp ORDER BY s
                   ROWS UNBOUNDED PRECEDING) - lv AS cb
          FROM pv),
        a AS (
          SELECT grp, CAST(SUM(pv) AS BIGINT) AS n_pos,
                 CAST(SUM(lv) - SUM(pv) AS BIGINT) AS n_neg,
                 SUM(CAST(pv AS HUGEINT) * (2 * cb + lv + 1)) AS r2
          FROM m GROUP BY 1)
        SELECT grp, n_pos, n_neg,
               CAST(ROUND(CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)
                   AS DOUBLE)
                 / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
                 * 1e6) AS BIGINT) AS auc_micro
        FROM a
        WHERE n_pos > 0 AND n_neg > 0
      """)),

    // Cumulative lift/gains at user deciles: rank users by click
    // volume, ask what multiple of the base purchase rate the top
    // deciles capture — the targeting-eval readout under every
    // "act on the top X%" decision (campaign sizing, review-queue
    // budgets). Deciles from ntile over the (score DESC, user_id)
    // total order — deterministic in both engines; counts and
    // cumulative sums exact, lift/gain at the ppm edge
    // (Calibration.liftCurve scaladoc).
    QueryDef(
      "q_lift_curve",
      (s, dir) => {
        val users = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "click", 1L)
            .otherwise(0L)).as("score"),
            max(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).as("y"))
        graft.operators.Calibration.liftCurve(
            users, "score", "user_id", col("y") === 1, k = 10)
          .orderBy(col("bucket"))
      },
      Some("""
        WITH u AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                          ELSE 0 END) AS BIGINT) AS score,
                 MAX(CASE WHEN event_type = 'purchase' THEN 1
                     ELSE 0 END) AS y
          FROM events GROUP BY 1),
        b AS (
          SELECT ntile(10) OVER (ORDER BY score DESC, user_id ASC)
                   AS bucket,
                 y
          FROM u),
        pb AS (
          SELECT CAST(bucket AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS pos
          FROM b GROUP BY 1),
        c AS (
          SELECT *,
                 CAST(SUM(n) OVER wo AS BIGINT) AS cum_n,
                 CAST(SUM(pos) OVER wo AS BIGINT) AS cum_pos,
                 CAST(SUM(n) OVER () AS BIGINT) AS totn,
                 CAST(SUM(pos) OVER () AS BIGINT) AS totpos
          FROM pb
          WINDOW wo AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING))
        SELECT bucket, n, pos, cum_n, cum_pos,
               (cum_pos * 1000000) // totpos AS gain_ppm,
               CAST(ROUND(CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)
                 / (CAST(totpos AS DOUBLE) / CAST(totn AS DOUBLE))
                 * 1e6) AS BIGINT) AS lift_ppm
        FROM c
        WHERE totpos > 0
        ORDER BY bucket
      """))
  )

  /** The DuckDB replay of [[graft.operators.LloydKMeans.fitSummary]]
    * — `iters` Lloyd steps unrolled as generated CTEs (assign →
    * re-center → keep-empty), every quantity on the same micro
    * lattice the Spark operator uses. Ends in `af(id, cell, dist)`,
    * the final assignment with its exact integer distance².
    */
  private def lloydCtes(k: Int, iters: Int): String = {
    val init = s"""dims AS (
          SELECT vec_id AS id, generate_subscripts(embedding, 1) AS i,
                 CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1e6)
                      AS BIGINT) AS xm
          FROM embeddings
          WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
        c0 AS (
          SELECT d.id AS cell, d.i, d.xm AS cm FROM dims d
          WHERE d.id IN (SELECT vec_id FROM embeddings
                         ORDER BY vec_id LIMIT $k))"""
    val steps = (1 to iters).map { t =>
      s""",
        d$t AS (
          SELECT d.id, c.cell,
                 SUM((d.xm - c.cm) * (d.xm - c.cm)) AS dist
          FROM dims d JOIN c${t - 1} c ON c.i = d.i GROUP BY 1, 2),
        a$t AS (
          SELECT id, cell FROM (
            SELECT id, cell, ROW_NUMBER() OVER (
              PARTITION BY id ORDER BY dist, cell) AS rn
            FROM d$t) WHERE rn = 1),
        u$t AS (
          SELECT a.cell, d.i,
                 CAST(ROUND(CAST(SUM(d.xm) AS DOUBLE) / COUNT(*))
                      AS BIGINT) AS cm
          FROM a$t a JOIN dims d ON d.id = a.id GROUP BY 1, 2),
        c$t AS (
          SELECT p.cell, p.i, COALESCE(u.cm, p.cm) AS cm
          FROM c${t - 1} p
          LEFT JOIN u$t u ON u.cell = p.cell AND u.i = p.i)"""
    }.mkString
    init + steps + s""",
        df AS (
          SELECT d.id, c.cell,
                 SUM((d.xm - c.cm) * (d.xm - c.cm)) AS dist
          FROM dims d JOIN c$iters c ON c.i = d.i GROUP BY 1, 2),
        af AS (
          SELECT id, cell, dist FROM (
            SELECT id, cell, dist, ROW_NUMBER() OVER (
              PARTITION BY id ORDER BY dist, cell) AS rn
            FROM df) WHERE rn = 1)"""
  }
}
