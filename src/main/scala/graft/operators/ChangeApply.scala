package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changeset application — the MERGE INTO kernel of a
  * continuously-ingested corpus: a batch of keyed change rows
  * (insert / update / delete, ordered by a sequence number) folds
  * into a snapshot, last-writer-wins per key.
  *
  * Semantics: for each key, only the change with the HIGHEST
  * sequence applies ('U' and 'I' both mean "this is the new row
  * image" — upsert; 'D' removes the key). Snapshot rows whose key
  * has no change pass through untouched. The changeset is expected
  * to carry unique (key, seq) pairs — CDC readers emit per-key
  * ordered sequences; ties would make "last" ambiguous, so order is
  * pinned by (seq desc, op asc) and documented rather than silently
  * nondeterministic.
  *
  * Scale design (100 TB snapshot, GB-scale changeset):
  *  - the ONLY window partitions by key over the CHANGESET — the
  *    snapshot is never windowed, never shuffled beyond the one
  *    anti-join;
  *  - the anti-join keys side is the deduped changeset key set
  *    (changeset-sized); AQE broadcasts it when small, so the common
  *    case reads the snapshot once at scan speed;
  *  - unknown op codes fail the job via `raise_error` instead of
  *    silently dropping rows — a malformed CDC feed must not
  *    half-apply.
  */
object ChangeApply {

  /** Apply `changes` to `snapshot`. `changes` must carry `keyCol`,
    * `seqCol`, `opCol` plus every snapshot column (the row image for
    * I/U; ignored for D). Output schema = snapshot schema.
    */
  def applyChangeset(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String): DataFrame = {
    Reserved.check("snapshot" -> snapshot, "changes" -> changes)
    val dataCols = snapshot.columns.toSeq
    require(dataCols.contains(keyCol), s"snapshot lacks key $keyCol")
    val missing = (dataCols.toSet + seqCol + opCol) -- changes.columns.toSet
    require(missing.isEmpty,
      s"changes lacks column(s) ${missing.mkString(", ")}")

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, col(opCol).asc)
    val last = changes
      .withColumn("__op", when(col(opCol).isin("I", "U", "D"), col(opCol))
        .otherwise(raise_error(concat(
          lit("ChangeApply: unknown op code "), col(opCol)))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)

    val untouched = snapshot.join(
      last.select(col(keyCol)), Seq(keyCol), "left_anti")
    val upserts = last.filter(col("__op") =!= "D")
      .select(dataCols.map(col): _*)
    untouched.unionByName(upserts)
  }
}
