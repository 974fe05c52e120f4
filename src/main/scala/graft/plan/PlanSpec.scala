package graft.plan

/** Declarative plan IR — the reference's whole entry experience is a
  * builder/YAML plan compiled to case classes and executed by a processor
  * (`api/.../PlanRun.scala`, `core/parser/PlanParser.scala:1-329`,
  * `core/plan/PlanProcessor.scala:25-129`, `TaskBuilder.scala` ~2.4k LoC).
  * This is the same shape at 1/50th the size: source + rules + thresholds +
  * scrub + sink as plain data, parseable from JSON or YAML, executed by
  * [[PlanRunner]] as ONE declarative Spark plan (the reference runs one job
  * per validation; see [[graft.rules.RuleEngine]]).
  */
final case class PlanSpec(
    name: String,
    source: SourceSpec,
    rules: Seq[RuleSpec] = Nil,
    /** Run the full image+caption quality-filter pipeline (langid +
      * perplexity + heuristic rules + scrub) before any extra `rules`. */
    qualityFilter: Boolean = false,
    /** String columns to PII/toxicity-scrub in place. */
    scrubFields: Seq[String] = Nil,
    /** Per-rule error threshold: <1 = fraction of rows, >=1 = absolute. */
    errorThreshold: Double = 0.0,
    /** Offending-row samples collected per failed rule. */
    numErrorSamples: Int = 5,
    /** Write only keep==true rows to the sink. */
    keepOnly: Boolean = false,
    sink: Option[SinkSpec] = None,
    /** Gate held before the plan executes (reference: `waitCondition` on
      * `YamlDataSourceValidation`, `ValidationModels.scala:360-401`). On
      * exhausted retries the plan still runs — reference semantics — but
      * the outcome records `waitMet = Some(false)`. */
    waitFor: Option[WaitSpec] = None)

/** Where to read: `format` ∈ parquet|csv|json|orc, or `table` (catalog name
  * in `path` — the Iceberg deployment path, `spark.read.table`). */
final case class SourceSpec(format: String = "parquet", path: String)

final case class SinkSpec(
    format: String = "parquet",
    path: String,
    mode: String = "overwrite",
    partitionBy: Seq[String] = Nil,
    /** Writer options (e.g. xml's required `rowTag`). */
    options: Map[String, String] = Map.empty)

/** Wait-gate IR: `typ` ∈ pause|fileExists|dataExists|webhook; the other
  * fields are per-type (pause→pauseMs; fileExists→path; dataExists→
  * format+path+expr; webhook→url). Compiled by
  * [[graft.rules.WaitCondition.fromSpec]].
  */
final case class WaitSpec(
    typ: String,
    path: String = "",
    expr: String = "true",
    url: String = "",
    format: String = "parquet",
    pauseMs: Long = 0L,
    maxRetries: Int = 10,
    retryIntervalMs: Long = 2000L)

/** A named SQL boolean over the source columns (true = row passes) — the
  * expr escape hatch covers the whole per-row vocabulary; builder-made rules
  * can be passed to [[PlanRunner.run]] directly as [[graft.rules.Rule]]s. */
final case class RuleSpec(name: String, expr: String)
