package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.sqlList
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Text-pipeline queries over the `documents` table, which plays the
  * essays corpus (FIXTURES.md §3). Each maps a reference operator
  * (SURVEY §2) to a declarative Spark plan: the narrow string ops stay
  * inside one whole-stage-codegen span; the only shuffle is the final
  * `groupBy(word)`.
  */
object TextQueries {

  val all: Seq[QueryDef] = Seq(

    // Phase-0 flagship (SURVEY §7): scan → split/explode (F10) →
    // stop-word filter (F7) → hash agg (A6) → top-25 (T1/T2, planned
    // as TakeOrderedAndProject). Tie order per quirk Q6: count desc,
    // word asc.
    QueryDef(
      "q_top_words",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        docs
          .select(explode(TextFunctions.splitWords(col("text"))).as("word"))
          .filter(!col("word").isin(TextFunctions.snowballStopWords: _*))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("word"))
          .limit(25)
      },
      Some(s"""
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word NOT IN (${sqlList(TextFunctions.snowballStopWords)})
        GROUP BY word
        ORDER BY cnt DESC, word ASC
        LIMIT 25
      """))
  )
}
