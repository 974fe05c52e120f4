package graft

import graft.functions.{Scrubber, TextFunctions => TF}
import graft.rules.{Rule, RuleEngine}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operator queries over the driver's parquet tables, each with a
  * DuckDB-portable oracle SQL twin. Column names are aliased identically on
  * both sides (the driver hash-compares after sorting columns by name).
  * Regex/text semantics are restricted to the Java-regex ∩ RE2 common subset
  * so both engines compute the same thing.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---- q1: aggregation (rule-engine groupBy validation substrate;
  //          SURVEY §2.5). Decimal casts → exact cross-engine sums. ----
  private def q1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_price"),
        count(lit(1)).as("cnt"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  sum(cast(l_quantity as decimal(18,2))) AS sum_qty,
      |  sum(cast(l_extendedprice as decimal(18,2))) AS sum_price,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---- q2: declarative quality rules → keep/drop_reason in one projection
  //          (the keep/drop kernel, SURVEY §2.4) ----
  private def q2(s: SparkSession, dir: String): DataFrame = {
    val text = col("text")
    val rules = Seq(
      Rule("text_missing", text.isNotNull && length(trim(text)) > 0),
      Rule("text_length", length(text).between(50, 400)),
      Rule("few_tokens", TF.tokenCount(text) >= 8),
      Rule("repetitive", TF.distinctTokenRatio(text) >= 0.3),
      Rule("symbolic", TF.symbolRatio(text) <= 0.2))
    RuleEngine.annotate(t(s, dir, "documents"), rules)
      .select(col("doc_id"), col("drop_reason"), col("keep"))
  }

  private val q2Sql =
    """WITH toks AS (
      |  SELECT doc_id, text,
      |    len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS ntok,
      |    len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0))) AS ndis,
      |    length(text) AS nchar,
      |    length(text) - length(regexp_replace(text, '[^A-Za-z0-9 \t\n\r]', '', 'g')) AS nsym
      |  FROM documents),
      |reasons AS (
      |  SELECT doc_id,
      |    CASE
      |      WHEN NOT coalesce(text IS NOT NULL AND length(trim(text)) > 0, FALSE) THEN 'text_missing'
      |      WHEN NOT coalesce(nchar BETWEEN 50 AND 400, FALSE) THEN 'text_length'
      |      WHEN NOT coalesce(ntok >= 8, FALSE) THEN 'few_tokens'
      |      WHEN NOT coalesce(CASE WHEN ntok > 0 THEN ndis * 1.0 / ntok END >= 0.3, FALSE) THEN 'repetitive'
      |      WHEN NOT coalesce(CASE WHEN nchar > 0 THEN nsym * 1.0 / nchar END <= 0.2, FALSE) THEN 'symbolic'
      |    END AS drop_reason
      |  FROM toks)
      |SELECT doc_id, drop_reason, drop_reason IS NULL AS keep FROM reasons""".stripMargin

  // ---- q3: PII/toxicity scrub chain with planted entities (SURVEY §7.1;
  //          counts staged exactly like Scrubber.scrubCounts) ----
  private def plantedCol: Column = {
    val id = col("doc_id")
    concat(col("text"),
      when(pmod(id, lit(7)) === 0,
        concat(lit(" contact u"), id.cast("string"), lit("@example.com now")))
        .when(pmod(id, lit(7)) === 1,
          concat(lit(" call +1 555-123-"), lpad(pmod(id, lit(9000)).cast("string") , 4, "0")))
        .when(pmod(id, lit(7)) === 2,
          concat(lit(" ssn 123-45-"), lpad(pmod(id, lit(9000)).cast("string"), 4, "0")))
        .when(pmod(id, lit(7)) === 3, lit(" badword content"))
        .otherwise(lit("")))
  }

  private def q3(s: SparkSession, dir: String): DataFrame = {
    val aug = plantedCol
    t(s, dir, "documents")
      .withColumn("aug", aug)
      .select(
        col("doc_id"),
        Scrubber.scrub(col("aug")).as("scrubbed"),
        element_at(Scrubber.scrubCounts(col("aug")), "email").as("n_email"),
        element_at(Scrubber.scrubCounts(col("aug")), "ssn").as("n_ssn"),
        element_at(Scrubber.scrubCounts(col("aug")), "phone").as("n_phone"),
        element_at(Scrubber.scrubCounts(col("aug")), "lexicon").as("n_lexicon"))
  }

  private val q3Sql = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
    val phone = "\\+?[0-9]{0,2}[ .-]?\\([0-9]{3}\\)[ .-]?[0-9]{3}[ .-]?[0-9]{4}|\\+[0-9]{1,2}[ .-]?[0-9]{3}[ .-]?[0-9]{3}[ .-]?[0-9]{4}|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
    val lex = "(?i)\\b(badword|slurx|cursez|vulgarq)\\b"
    s"""WITH aug AS (
       |  SELECT doc_id, text ||
       |    CASE
       |      WHEN doc_id % 7 = 0 THEN ' contact u' || cast(doc_id AS varchar) || '@example.com now'
       |      WHEN doc_id % 7 = 1 THEN ' call +1 555-123-' || lpad(cast(doc_id % 9000 AS varchar), 4, '0')
       |      WHEN doc_id % 7 = 2 THEN ' ssn 123-45-' || lpad(cast(doc_id % 9000 AS varchar), 4, '0')
       |      WHEN doc_id % 7 = 3 THEN ' badword content'
       |      ELSE ''
       |    END AS aug
       |  FROM documents),
       |s1 AS (SELECT doc_id, aug AS t0, len(regexp_extract_all(aug, '$email')) AS n_email,
       |         regexp_replace(aug, '$email', '[EMAIL]', 'g') AS t1 FROM aug),
       |s2 AS (SELECT *, len(regexp_extract_all(t1, '$ssn')) AS n_ssn,
       |         regexp_replace(t1, '$ssn', '[SSN]', 'g') AS t2 FROM s1),
       |s3 AS (SELECT *, len(regexp_extract_all(t2, '$phone')) AS n_phone,
       |         regexp_replace(t2, '$phone', '[PHONE]', 'g') AS t3 FROM s2),
       |s4 AS (SELECT *, len(regexp_extract_all(t3, '$lex')) AS n_lexicon,
       |         regexp_replace(t3, '$lex', '[CENSORED]', 'g') AS t4 FROM s3)
       |SELECT doc_id, t4 AS scrubbed, n_email, n_ssn, n_phone, n_lexicon FROM s4""".stripMargin
  }

  // ---- q4: join + broadcast dim + agg (SURVEY §2.3) ----
  private def q4(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"),
        count(lit(1)).as("n_orders"))

  private val q4Sql =
    """SELECT n_name,
      |  sum(cast(o_totalprice as decimal(18,2))) AS revenue,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  // ---- q5: window / monotonicity violations (SURVEY §2.6; distributed
  //          window — partitioned by user, never a global orderBy) ----
  private def q5(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .where(col("prev_value").isNotNull && col("value") < col("prev_value"))
      .select(col("event_id"), col("user_id"))
  }

  private val q5Sql =
    """SELECT event_id, user_id FROM (
      |  SELECT event_id, user_id, value,
      |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      |  FROM events)
      |WHERE prev_value IS NOT NULL AND value < prev_value""".stripMargin

  // ---- q6: exact dedup via portable fingerprint → survivor per group
  //          (SURVEY §2.5 unique-field dedup) ----
  private def normalizedSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  private def q6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(TF.normalized(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("dup_count"))
      .select(col("survivor_id"), col("dup_count"))

  private val q6Sql =
    s"""SELECT min(doc_id) AS survivor_id, count(*) AS dup_count
       |FROM documents GROUP BY md5($normalizedSql)""".stripMargin

  // ---- q7: token statistics (text analysis; integers only — no float
  //          hashing hazards) ----
  private def q7(s: SparkSession, dir: String): DataFrame = {
    val toks = TF.tokens(col("text"))
    t(s, dir, "documents").select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      aggregate(toks, lit(0L), (acc, x) => acc + length(x).cast("long")).as("sum_token_len"))
  }

  private val q7Sql =
    """SELECT doc_id,
      |  cast(len(toks) AS bigint) AS n_tokens,
      |  cast(len(list_distinct(toks)) AS bigint) AS n_distinct,
      |  cast(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS bigint) AS sum_token_len
      |FROM (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
      |      FROM documents)""".stripMargin

  // ---- q8: document fingerprinting (md5-based — portable across engines,
  //          unlike xxhash64) ----
  private def q8(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      TF.fingerprint(col("text")).as("fp16"))

  private val q8Sql =
    s"""SELECT doc_id, substring(md5($normalizedSql), 1, 16) AS fp16
       |FROM documents""".stripMargin

  // ---- q9: language-ID n-gram/stopword heuristic (SQL-expressible twin of
  //          the fastText-style model; argmax with canonical tiebreak) ----
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "with", "is"),
    "es" -> Seq("el", "la", "que", "por", "con"),
    "fr" -> Seq("le", "les", "des", "une", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "zh" -> Seq("的", "是", "不"))

  private def q9(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
    val hits = langMarkers.map { case (lang, ms) =>
      TF.markerHits(col("text"), ms).cast("long").as(s"hits_$lang")
    }
    val df = base.select((col("doc_id") +: hits): _*)
    val h = langMarkers.map { case (l, _) => col(s"hits_$l") }
    val guess = when(h(0) >= h(1) && h(0) >= h(2) && h(0) >= h(3) && h(0) >= h(4), "en")
      .when(h(1) >= h(2) && h(1) >= h(3) && h(1) >= h(4), "es")
      .when(h(2) >= h(3) && h(2) >= h(4), "fr")
      .when(h(3) >= h(4), "de")
      .otherwise("zh")
    df.withColumn("guess", guess)
  }

  private val q9Sql = {
    def hits(ms: Seq[String]) =
      s"cast(len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0), x -> x IN (${ms.map(m => s"'$m'").mkString(",")}))) AS bigint)"
    val cols = langMarkers.map { case (l, ms) => s"${hits(ms)} AS hits_$l" }.mkString(",\n  ")
    s"""WITH h AS (SELECT doc_id, $cols FROM documents)
       |SELECT doc_id, hits_en, hits_es, hits_fr, hits_de, hits_zh,
       |  CASE
       |    WHEN hits_en >= hits_es AND hits_en >= hits_fr AND hits_en >= hits_de AND hits_en >= hits_zh THEN 'en'
       |    WHEN hits_es >= hits_fr AND hits_es >= hits_de AND hits_es >= hits_zh THEN 'es'
       |    WHEN hits_fr >= hits_de AND hits_fr >= hits_zh THEN 'fr'
       |    WHEN hits_de >= hits_zh THEN 'de'
       |    ELSE 'zh'
       |  END AS guess
       |FROM h""".stripMargin
  }

  // ---- q10: brute-force cosine top-k similarity search over embeddings
  //          (broadcast query side — the baseline ANN path) ----
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val qs = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cs = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val dot = aggregate(zip_with(col("qe"), col("ce"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, z) => acc + z)
    val nq = aggregate(col("qe"), lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    val nc = aggregate(col("ce"), lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    cs.crossJoin(broadcast(qs))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", dot / sqrt(nq * nc))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 10)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  private val q10Sql =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 8),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce FROM embeddings),
      |p AS (SELECT query_id, neighbor_id,
      |        list_inner_product(qe, ce) / sqrt(list_inner_product(qe, qe) * list_inner_product(ce, ce)) AS sim
      |      FROM c, q WHERE neighbor_id <> query_id),
      |r AS (SELECT query_id, neighbor_id,
      |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
      |      FROM p)
      |SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= 10""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1 _),
    "q2_quality_rules" -> (q2 _),
    "q3_scrub" -> (q3 _),
    "q4_join_agg" -> (q4 _),
    "q5_window_monotonic" -> (q5 _),
    "q6_dedup_exact" -> (q6 _),
    "q7_token_stats" -> (q7 _),
    "q8_fingerprint" -> (q8 _),
    "q9_langid_markers" -> (q9 _),
    "q10_similarity_topk" -> (q10 _),
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" -> q1Sql,
    "q2_quality_rules" -> q2Sql,
    "q3_scrub" -> q3Sql,
    "q4_join_agg" -> q4Sql,
    "q5_window_monotonic" -> q5Sql,
    "q6_dedup_exact" -> q6Sql,
    "q7_token_stats" -> q7Sql,
    "q8_fingerprint" -> q8Sql,
    "q9_langid_markers" -> q9Sql,
    "q10_similarity_topk" -> q10Sql,
  )
}
