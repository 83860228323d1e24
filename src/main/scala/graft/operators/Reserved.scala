package graft.operators

import org.apache.spark.sql.DataFrame

/** The join operators stage internal temp columns under a reserved
  * `__` prefix (`__k`, `__t`, `__side`, `__p`, `__match`,
  * `__matched_t`, `__salt`, `__b`, `__tl`, `__mt`, `__lb`, `__g`,
  * `__t`, `__w`). An input already
  * carrying such a name would produce a confusing ambiguous-reference
  * analysis error — or, worse, silently resolve to the wrong column —
  * so every operator rejects it eagerly with a named error.
  */
private[operators] object Reserved {

  def check(dfs: (String, DataFrame)*): Unit =
    dfs.foreach { case (side, df) =>
      val bad = df.columns.filter(_.startsWith("__"))
      require(bad.isEmpty,
        s"$side input uses reserved __-prefixed column name(s) " +
          s"[${bad.mkString(", ")}]: the operator stages internal " +
          "columns under the __ prefix; rename them upstream")
    }
}
