package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Persisted IVF index: querying the parquet index must return
  * exactly what the live sampled-codebook search returns over the
  * same corpus — the build-once/query-many round-trip.
  */
class IvfIndexSpec extends SparkSuite {
  import spark.implicits._

  test("index round-trip equals the live search") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString

    Similarity.writeIvfIndex(emb, "vec_id", "embedding", nlist = 16, dir)
    val fromIndex = Similarity
      .ivfTopKFromIndex(queries, "vec_id", "embedding",
        k = 5, nprobe = 4, dir)
      .select($"query_id".cast("long"), $"neighbor_id".cast("long"),
        $"cosine", $"rank".cast("long"))
      .as[(Long, Long, Double, Long)].collect().toSet
    val live = Similarity
      .ivfTopKSampledCodebook(queries, emb, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4)
      .select($"query_id".cast("long"), $"neighbor_id".cast("long"),
        $"cosine", $"rank".cast("long"))
      .as[(Long, Long, Double, Long)].collect().toSet

    assert(fromIndex.nonEmpty)
    assert(fromIndex == live,
      "store-fed search must equal the live sampled-codebook search")
  }
}
