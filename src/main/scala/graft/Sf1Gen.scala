package graft

import org.apache.spark.sql.functions._

/** Synthesizes an sf1-scale (default 10×) dataset from sf0.1 for the scale
  * readiness probe: each fact table is replicated `copies` times with its
  * key columns shifted by copy × (1 + max key), so FK relationships,
  * per-key distributions, group sizes and selectivities are preserved while
  * total volume scales linearly. Dimension tables (region, nation) stay
  * single-copy. Text/vector payloads repeat verbatim — near-dup bucket
  * sizes therefore scale ×copies, which is exactly the stress the LSH/pair
  * caps exist for. NOT an oracle surface: the probe measures runtime shape
  * (cliffs, strategy flips), not result parity.
  * Usage: runMain graft.Sf1Gen [srcDir] [dstDir] [copies]
  */
object Sf1Gen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val keyCols: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      // l_partkey/l_suppkey stay unshifted: no query joins them, and an
      // independent max-based stride would misalign them with part/supplier
      "lineitem" -> Seq("l_orderkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "part" -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey"))
    val dims = Seq("region", "nation")
    dims.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"$t: copied")
    }
    // an FK column's stride must come from the table that OWNS the key
    // space: shifting o_custkey by orders' own max would drift out of
    // customer's copy ranges whenever max(o_custkey) < max(c_custkey)
    // (customers with no orders), silently breaking the FK joins the probe
    // exists to stress. (The two maxima happen to coincide on sf0.1; this
    // pins the alignment structurally.)
    val keyOwner: Map[String, (String, String)] = Map(
      "o_custkey" -> ("customer", "c_custkey"),
      "l_orderkey" -> ("orders", "o_orderkey"))
    keyCols.foreach { case (t, keys) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val strides = keys.map { k =>
        k -> (keyOwner.get(k) match {
          case Some((pt, pk)) =>
            spark.read.parquet(s"$src/$pt.parquet").agg(max(col(pk))).head().getLong(0) + 1L
          case None => df.agg(max(col(k))).head().getLong(0) + 1L
        })
      }.toMap
      val scaled = keys.foldLeft(
        df.withColumn("__k", explode(sequence(lit(0L), lit(copies - 1L))))) {
        case (d, k) => d.withColumn(k, col(k) + col("__k") * strides(k))
      }.drop("__k")
      scaled.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"$t: ${copies}x, strides $strides")
    }
    spark.stop()
  }
}
