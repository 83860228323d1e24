package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Log10IDF, StratifiedSplit, TrimmedCountVectorizer}
import org.apache.spark.ml.classification.DecisionTreeClassifier
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{PCA, StandardScaler}
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
    // No oracle: DuckDB trains no trees.
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
        val (train, test) =
          StratifiedSplit.split(featurized, "label", 0.7, 32984L)
        val dt = new DecisionTreeClassifier()
          .setLabelCol("label").setFeaturesCol("features")
          .setMaxDepth(8).setSeed(32984L)
        val model = graft.operators.TreePruning.pruneCp(dt.fit(train), 0.02)
        model.transform(test)
          .groupBy(col("prediction"), col("label"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("prediction"), col("label"))
      },
      None),

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

    // M8 — k-means on the embeddings table (k=10, fixed seed); cluster
    // sizes + training cost. The reference's nstart=50 best-of-restarts
    // intent is available via graft.operators.KMeansBestOfSeeds.
    QueryDef(
      "q_kmeans_cost",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
          .select(VectorFunctions.toMlVector(col("embedding")).as("features"))
        val km = new KMeans()
          .setK(10).setSeed(42L).setFeaturesCol("features")
          .setPredictionCol("cluster")
        val model = km.fit(emb)
        val cost = model.summary.trainingCost
        model.summary.predictions
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("size"))
          .withColumn("training_cost", round(lit(cost), 4))
          .orderBy(col("cluster"))
      },
      None),

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

    // M10 — standardize (guarding zero-variance is unnecessary on the
    // synthetic embeddings; see OkCupidPipeline for the guarded path)
    // then PCA; per-component explained variance.
    QueryDef(
      "q_pca_variance",
      (s, dir) => {
        import s.implicits._
        val emb = Tables.embeddings(s, dir)
          .select(VectorFunctions.toMlVector(col("embedding")).as("features"))
        val scaler = new StandardScaler()
          .setWithMean(true).setWithStd(true)
          .setInputCol("features").setOutputCol("scaled")
        val scaled = scaler.fit(emb).transform(emb)
        val pca = new PCA().setK(8).setInputCol("scaled").setOutputCol("pc")
        val model = pca.fit(scaled)
        model.explainedVariance.toArray.zipWithIndex
          .map { case (v, i) => (i, BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
          .toSeq.toDF("component", "explained_variance")
          .orderBy(col("component"))
      },
      None)
  )
}
