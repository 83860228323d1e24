package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-width right-sizing for CPU-heavy per-row work (optimization
  * guide §2.5: "one huge unsplittable file … repartition immediately
  * after the read").
  *
  * A small parquet table is one row group, so it arrives as ONE scan
  * split — and every downstream narrow stage (shingling, hash
  * lattices, brute-force similarity scoring against a broadcast)
  * inherits that width: one task computes while the rest of the
  * machine idles. Measured on the r19 bench profile: the
  * q_minhash_calibration md5-lattice map stage ran 16.3 s in a
  * single task with 31 cores idle; q_pagerank's kNN edge build 5.2 s
  * in one task.
  *
  * [[widen]] repartitions ONLY when the input is narrower than the
  * session's parallelism, to exactly that parallelism — derived from
  * the session, never a constant, so `local[8]` widens to 8 and a
  * 1000-core cluster to its own width. At production scale a corpus
  * scan already has thousands of splits and this is a NO-OP; when it
  * does fire, the exchanged input is by construction small (narrow
  * inputs are small inputs — a 100-TB table is never one split), so
  * the added exchange is bounded while the unlocked map stage is the
  * expensive one. Round-robin keeps whatever row multiset arrives;
  * every consumer here is partition-order-independent by the
  * engine's lattice conventions (the oracles verify it).
  */
object Par {

  /** `df` repartitioned round-robin to the session's default
    * parallelism when currently narrower; `df` unchanged otherwise.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
