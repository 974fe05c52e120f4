package graft

import org.apache.spark.sql.functions._

/** Connected-components scale probe: a planted-component graph at >=10M
  * edges, asserting the properties the sf0.1 oracle run cannot exercise —
  *  - round count stays ~log2(diameter) (pointer jumping engages),
  *  - the edge-count-derived shuffle width actually grows PAST the
  *    session default (sf0.1 only ever plans p=2),
  *  - every planted component comes back exactly (count + sizes + the
  *    smallest-member labeling invariant).
  *
  * Graph: `comps` disjoint paths of `size` nodes each (diameter size-1 —
  * the worst propagation shape), node ids scrambled by an affine
  * permutation mod a prime so consecutive path nodes land in different
  * partitions (no accidental locality making rounds artificially cheap).
  *
  * Usage: sbt "runMain graft.CCProbe [cores] [comps] [size]"
  * Writes CC_PROBE.json in the working directory.
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val comps = args.lift(1).map(_.toLong).getOrElse(3000L)
    val size = args.lift(2).map(_.toLong).getOrElse(4096L)
    val n = comps * size // nodes; edges = n - comps
    val spark = GraftSession.builder(s"local[$cores]", cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // affine bijection on [0, P) for prime P > n: scatters path neighbors
    val P = java.math.BigInteger.valueOf(n).nextProbablePrime().longValueExact()
    val a = 6364136223846793005L % P
    def perm(c: org.apache.spark.sql.Column) =
      pmod(c % P * (a % P) + 1442695040888963407L % P, lit(P))

    // path edges (i, i+1) within each component, both endpoints permuted
    val ids = spark.range(0, n, 1, cores * 4)
    val edges = ids.where(col("id") % size =!= (size - 1))
      .select(perm(col("id")).as("a_id"), perm(col("id") + 1).as("b_id"))

    val t0 = System.nanoTime()
    val (labels, rounds, p) =
      dedup.Dedup.connectedComponentsStats(edges, maxIter = 40)
    val byLabel = labels.groupBy("label").agg(count("*").as("sz"),
      min(col("id")).as("mn")).persist()
    val nLabels = byLabel.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val wrongSize = byLabel.where(col("sz") =!= size).count()
    // smallest-member labeling: the label IS the component's min id
    val wrongLabel = byLabel.where(col("label") =!= col("mn")).count()
    byLabel.unpersist()

    val edgeCount = n - comps
    val log2d = (math.log((size - 1).toDouble) / math.log(2)).ceil.toInt
    // hybrid CC: fixed 8-round propagation budget + ~log2(d) star rounds
    // (+2 fixpoint-detection rounds) — logarithmic, not linear, in diameter
    val ok = nLabels == comps && wrongSize == 0 && wrongLabel == 0 &&
      rounds <= log2d + 10 && p > 32
    val line =
      s"""{"probe":"cc_scale","cores":$cores,"nodes":$n,"edges":$edgeCount,""" +
      s""""components":$comps,"diameter":${size - 1},"rounds":$rounds,""" +
      s""""log2_diameter":$log2d,"shuffle_width":$p,"session_default":32,""" +
      s""""sec":${math.round(sec * 100) / 100.0},"labels_found":$nLabels,""" +
      s""""wrong_size":$wrongSize,"wrong_label":$wrongLabel,"ok":$ok}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("CC_PROBE.json"), line + "\n")
    println(line)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
