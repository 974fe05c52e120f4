package graft.generator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Foreign-key relationship maintenance, recast from the reference's FK
  * processor (`core/foreignkey/ForeignKeyProcessor.scala:42-145`):
  *  - [[assignKeys]]: the distributed-sampling strategy — index the distinct
  *    source keys (sorted-array posexplode on the SMALL lookup side only;
  *    the reference uses a single-partition row_number window there,
  *    `strategy/DistributedSamplingStrategy.scala:34-119`), give every
  *    target row a deterministic index from its own identity, broadcast-join
  *  - [[insertOrder]] / [[deleteOrder]]: topological order over the FK graph
  *    (`util/InsertOrderCalculator.scala`) — driver-side, no Spark op
  */
object ForeignKeys {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.DataType

  /** FK endpoints may be NESTED paths (`body.account_id` — the reference's
    * `foreignkey/util/NestedFieldUtil.scala` reads and updates struct
    * leaves): write through the owning struct with `withField`; a bare
    * `withColumn("a.b", ...)` would instead create a LITERAL dotted
    * top-level column and silently leave the nested field untouched. */
  private def setField(df: DataFrame, path: String, value: Column): DataFrame =
    if (!path.contains(".")) df.withColumn(path, value)
    else {
      val Array(top, inner) = path.split("\\.", 2)
      df.withColumn(top, col(top).withField(inner, value))
    }

  /** Data type at a (possibly nested) field path. */
  private def fieldType(df: DataFrame, path: String): DataType =
    path.split("\\.").foldLeft(df.schema: DataType) { (dt, p) =>
      dt match {
        case s: org.apache.spark.sql.types.StructType => s(p).dataType
        case other => throw new IllegalArgumentException(
          s"field path '$path': expected a struct at '$p', got $other")
      }
    }

  /** Replace/assign `targetCol` in `target` with values sampled uniformly
    * (and deterministically, keyed on `identityCol`) from the distinct
    * values of `source.sourceCol`. The lookup side is broadcast — the big
    * side never shuffles.
    */
  def assignKeys(
      target: DataFrame,
      identityCol: String,
      targetCol: String,
      source: DataFrame,
      sourceCol: String,
      seed: Long = 42L,
      maxLookup: Long = 50000000L): DataFrame =
    assignKeys(target, identityCol, Seq(targetCol), source, Seq(sourceCol), seed, maxLookup)

  /** Composite (multi-field) FK assignment — the reference's relations are
    * field LISTS (`api/.../model/PlanModels.scala:27-76`): the sampled unit
    * is the distinct TUPLE of source fields, so child rows always carry a
    * (col1, col2, ...) combination that exists together in the parent, never
    * an independent per-column mix. Same shape as the single-column path:
    * sorted-array + posexplode indexes the bounded tuple domain on the
    * lookup side only (struct sort = lexicographic by field order, a total
    * order over distinct tuples), every target row derives a deterministic
    * index from its own identity, and the lookup is broadcast — the big side
    * never shuffles.
    */
  def assignKeys(
      target: DataFrame,
      identityCol: String,
      targetCols: Seq[String],
      source: DataFrame,
      sourceCols: Seq[String],
      seed: Long,
      maxLookup: Long): DataFrame = {
    require(targetCols.nonEmpty && targetCols.size == sourceCols.size,
      s"assignKeys: target fields $targetCols and source fields $sourceCols must pair up")
    // null keys are never assignable FK values; a tuple with ANY null field
    // is excluded (SQL composite-key semantics: null never equals anything)
    // source fields may be nested paths — alias each to a positional name
    // so the lookup struct's getField below stays well-defined
    val keys = source
      .select(sourceCols.zipWithIndex.map { case (s, i) => col(s).as(s"__sk_$i") }: _*)
      .where(sourceCols.indices.map(i => col(s"__sk_$i").isNotNull).reduce(_ && _))
      .distinct()
    // contiguous ordered index on the lookup side only: bounded by the
    // distinct key count (asserted below — a fact-sized "lookup" must fail
    // fast, not silently sort terabytes on one node). sorted-array +
    // posexplode replaces the global row_number window: collect_list does a
    // map-side partial per partition, the merged array lives in ONE bounded
    // row, and posexplode re-expands with the 0-based ascending-key index —
    // identical to row_number()-1 over ORDER BY key.
    val n = keys.count()
    require(n > 0, s"assignKeys: source '${sourceCols.mkString(",")}' has no distinct keys")
    require(n <= maxLookup,
      s"assignKeys: lookup side has $n distinct keys > maxLookup=$maxLookup — " +
        "the index array is single-row by design and only safe on a " +
        "bounded dimension side; raise maxLookup deliberately if intended")
    val lookup = keys
      .agg(sort_array(collect_list(struct(sourceCols.indices.map(i => col(s"__sk_$i")): _*)))
        .as("__ks"))
      .select(posexplode(col("__ks")).as(Seq("__idx", "__k")))
      .select(col("__idx").cast("long").as("__idx") +:
        sourceCols.indices.map(i => col("__k").getField(s"__sk_$i").as(s"__fk_$i")): _*)
    val joined = target
      // plain target fields are replaced wholesale; nested ones are
      // overwritten inside their struct below (nothing to drop)
      .drop(targetCols.filterNot(_.contains(".")): _*)
      .withColumn("__idx", pmod(xxhash64(lit(seed), col(identityCol)), lit(n)))
      .join(broadcast(lookup), Seq("__idx"), "left")
      .drop("__idx")
    targetCols.zipWithIndex.foldLeft(joined) { case (d, (t, i)) =>
      setField(d, t, col(s"__fk_$i")).drop(s"__fk_$i")
    }
  }

  /** Kahn topological sort over FK edges (parent -> child). Returns tables
    * in insert order; throws on cycles (same contract as the reference).
    */
  def insertOrder(tables: Seq[String], edges: Seq[(String, String)]): Seq[String] = {
    val inDeg = scala.collection.mutable.Map(tables.map(_ -> 0): _*)
    edges.foreach { case (_, c) => inDeg(c) += 1 }
    val queue = scala.collection.mutable.Queue(tables.filter(inDeg(_) == 0).sorted: _*)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (queue.nonEmpty) {
      val t = queue.dequeue()
      out += t
      edges.filter(_._1 == t).map(_._2).sorted.foreach { c =>
        inDeg(c) -= 1
        if (inDeg(c) == 0) queue.enqueue(c)
      }
    }
    require(out.size == tables.size, s"FK graph has a cycle: ${tables.diff(out)}")
    out.toSeq
  }

  /** Partial-relationship nullability (the reference's FK `nullability`
    * post-processing, `core/foreignkey/strategy/NullabilityStrategy.scala`):
    * a fraction of child rows gets NULL in the FK fields, after key
    * assignment. Strategies:
    *
    *  - `random`: keyed hash on the row identity < pct — deterministic and
    *    partitioning-invariant (the reference hashes all columns + seed,
    *    same idea);
    *  - `head` / `tail`: first/last pct of rows IN GENERATION ORDER. The
    *    reference counts the frame and ranks it through an unpartitioned
    *    `Window.orderBy(lit(1))` — a single-task sort at scale. Here the
    *    row index is recovered from the sequential identity column the
    *    runner already carries and the total is the planned row count, so
    *    both strategies are one narrow projection: no count job, no window,
    *    no shuffle.
    *
    * All FK fields of the relation null together (a half-null composite FK
    * would be a key that never existed). */
  def applyNullability(
      df: DataFrame,
      identityCol: String,
      fkCols: Seq[String],
      pct: Double,
      strategy: String,
      totalRows: Long,
      seed: Long): DataFrame = {
    require(pct >= 0.0 && pct <= 1.0, s"nullPercentage $pct out of [0,1]")
    if (pct == 0.0) return df
    // identity is "<name>:<zero-padded index>" — the suffix is the row index
    val rowIdx = substring_index(col(identityCol), ":", -1).cast("long")
    val flag = strategy.toLowerCase match {
      case "head" => rowIdx < math.round(totalRows * pct)
      case "tail" => rowIdx >= totalRows - math.round(totalRows * pct)
      case "random" =>
        (pmod(xxhash64(lit(seed), col(identityCol)), lit(1L << 40)).cast("double")
          / lit((1L << 40).toDouble)) < pct
      case other => throw new IllegalArgumentException(
        s"unknown FK nullability strategy '$other' (random|head|tail)")
    }
    fkCols.foldLeft(df)((d, c) =>
      setField(d, c, when(flag, lit(null).cast(fieldType(d, c))).otherwise(col(c))))
  }

  /** FK generation mode `all-combinations` (the reference's
    * `core/foreignkey/strategy/GenerationModeStrategy.scala:107-166`): the
    * child frame is split into 2^n blocks (n = FK field count); in block c,
    * FK field i keeps its sampled VALID value iff bit i of c is set and is
    * otherwise replaced with a deterministic INVALID value — so every
    * valid/invalid pattern of the n-field key appears in the output. The
    * reference ranks rows with an unpartitioned `row_number().over(Window
    * .orderBy(lit(1)))` — a single-task global sort at scale; here the block
    * id derives from the sequential row identity the generator already
    * carries, so the whole mode is ONE narrow projection: no count job, no
    * window, no shuffle, partitioning-invariant.
    *
    * Invalid values mirror the reference's seeded branch: strings →
    * "INVALID_" + 8 hash hex chars, int/long → identity-keyed positive hash
    * mod 999999999 / 999999999999 (the reference's constants), other types →
    * NULL. All are keyed on (seed, row identity, field index) so re-runs are
    * bit-identical on any partitioning.
    *
    * `totalRows <= 0` (a cardinality fan-out child, whose identity is not
    * sequential) switches the block id to a keyed hash: every pattern still
    * appears with ~uniform frequency, only the contiguous-block layout is
    * given up — same contract as [[applyNullability]]'s random strategy.
    */
  def applyAllCombinations(
      df: DataFrame,
      identityCol: String,
      fkCols: Seq[String],
      totalRows: Long,
      seed: Long): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    require(fkCols.nonEmpty, "applyAllCombinations: no FK fields")
    require(fkCols.size <= 20,
      s"applyAllCombinations: ${fkCols.size} FK fields → 2^${fkCols.size} patterns is not a usable matrix")
    val combos = 1 << fkCols.size
    val comboId =
      if (totalRows > 0) {
        // identity is "<name>:<zero-padded index>" — the suffix is the row index
        val rowIdx = substring_index(col(identityCol), ":", -1).cast("long")
        pmod(floor(rowIdx / lit(math.max(1L, totalRows / combos))).cast("long"), lit(combos.toLong))
      } else pmod(xxhash64(lit(seed), lit("combo"), col(identityCol)), lit(combos.toLong))
    fkCols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val invalidate = comboId.bitwiseAND(lit((1 << i).toLong)) === 0L
      val invalid = fieldType(d, c) match {
        case StringType =>
          concat(lit("INVALID_"),
            substring(md5(concat_ws(":", lit(seed), col(identityCol), lit(i))), 1, 8))
        case IntegerType =>
          pmod(xxhash64(lit(seed), col(identityCol), lit(i)), lit(999999999L)).cast(IntegerType)
        case LongType =>
          pmod(xxhash64(lit(seed), col(identityCol), lit(i)), lit(999999999999L))
        case dt => lit(null).cast(dt)
      }
      setField(d, c, when(invalidate, invalid).otherwise(col(c)))
    }
  }

  /** Cardinality-driven record-count adjustment — the reference's
    * `CardinalityCountAdjustmentProcessor` (`core/plan/
    * CardinalityCountAdjustmentProcessor.scala:20-110`): an FK edge with a
    * 1:ratio cardinality forces child count = parent count × ratio, so
    * generation produces the right number of rows upfront instead of
    * duplicating afterwards. Ratios compound along FK chains (topo order);
    * an explicitly configured child count is overridden, like the reference.
    */
  def adjustCounts(
      counts: Map[String, Long],
      cardinality: Seq[(String, String, Double)]): Map[String, Long] = {
    val order = insertOrder(counts.keys.toSeq.sorted,
      cardinality.map { case (p, c, _) => p -> c })
    order.foldLeft(counts) { (acc, table) =>
      cardinality.filter(_._2 == table) match {
        case Nil => acc
        case parents =>
          val adjusted = parents.map { case (p, _, r) => math.round(acc(p) * r) }.max
          acc + (table -> adjusted)
      }
    }
  }

  /** Delete order = reverse insert order (children first). */
  def deleteOrder(tables: Seq[String], edges: Seq[(String, String)]): Seq[String] =
    insertOrder(tables, edges).reverse

  /** Cleanup stage (the reference's delete processor,
    * `core/delete/DeleteRecordProcessor.scala`): remove from `table` the
    * rows whose keys appear in the tracked-records frame — one anti-join.
    */
  def deleteTracked(table: DataFrame, tracked: DataFrame, keyCols: Seq[String]): DataFrame =
    table.join(tracked.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
}
