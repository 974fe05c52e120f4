package graft.pipeline

import graft.SparkSuite
import graft.corpus.SyntheticImages
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {

  // the corpus plants a hot phash cluster: cluster 0 (phash >> 6 == 0)
  // holds ~20% of all rows — the skew fixture of SURVEY §7.4.4
  private lazy val corpus = SyntheticImages.generate(spark, 20000L, seed = 42L, partitions = 16)
    .toDF().withColumn("cluster", org.apache.spark.sql.functions.expr("phash div 64"))

  test("hot cluster exists and naive repartition concentrates it in one task") {
    val hotShare = corpus.where(col("cluster") === 0).count().toDouble / 20000.0
    assert(hotShare > 0.15 && hotShare < 0.25, s"fixture drift: hot share $hotShare")
    val naive = corpus.repartition(32, col("cluster"))
    val share = Skew.maxPartitionShare(naive)
    assert(share >= hotShare, s"naive colocation should concentrate >= hot share, got $share")
  }

  test("salted repartition spreads the hot cluster; salt is partitioning-invariant") {
    val salted = Skew.saltedRepartition(corpus, Seq("cluster"), "image_id",
      salts = 16, numPartitions = 32)
    val share = Skew.maxPartitionShare(salted)
    // hot cluster held ~20% — after salting no partition holds more than ~6%
    assert(share < 0.08, s"salted max partition share $share still skewed")
    // deterministic: same row -> same salt regardless of input partitioning
    val s1 = corpus.select(col("image_id"), Skew.salt(col("image_id"), 8).as("s"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val s2 = SyntheticImages.generate(spark, 20000L, seed = 42L, partitions = 3)
      .select(col("image_id"), Skew.salt(col("image_id"), 8).as("s"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    s2.foreach { case (id, s) => assert(s1(id) == s) }
  }

  test("per-key results recompose exactly across salts (two-stage contract)") {
    val perSalt = corpus
      .groupBy(col("cluster"), Skew.salt(col("image_id"), 8).as("s"))
      .agg(count(lit(1)).as("n"))
    val merged = perSalt.groupBy("cluster").agg(sum("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = corpus.groupBy("cluster").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == direct)
  }
}
