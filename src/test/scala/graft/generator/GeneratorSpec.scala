package graft.generator

import graft.SparkSuite
import org.apache.spark.sql.functions._

class GeneratorSpec extends SparkSuite {
  import graft.SharedSpark.spark.implicits._

  private val specs = Seq(
    SequentialField("row_id", "R", 8),
    IntField("qty", 1, 100),
    DoubleField("price", 10.0, 500.0),
    ExponentialField("delay", 0.1),
    OneOfField("category", Seq(("alpha", 0.5), ("beta", 0.3), ("gamma", 0.2))),
    AlphaNumField("code", 4, 12),
    DateField("d", "2020-01-01", 365),
    TimestampField("ts", "2020-01-01 00:00:00", 86400L * 30),
    SqlField("total", "qty * price"))

  test("schema, row count, ranges, uniqueness of sequential ids") {
    val df = Generator.generate(spark, 5000L, specs, seed = 1L).cache()
    assert(df.count() == 5000)
    assert(df.columns.toSeq ==
      Seq("row_id", "qty", "price", "delay", "category", "code", "d", "ts", "total"))
    assert(df.where(!col("qty").between(1, 100)).count() == 0)
    assert(df.where(col("price") < 10.0 || col("price") >= 500.0).count() == 0)
    assert(df.where(col("delay") < 0).count() == 0)
    assert(df.select("row_id").distinct().count() == 5000)
    assert(df.where(!col("category").isin("alpha", "beta", "gamma")).count() == 0)
    assert(df.where(length(col("code")) < 4 || length(col("code")) > 12).count() == 0)
    assert(df.where(col("d") < lit("2020-01-01") || col("d") > lit("2020-12-31")).count() == 0)
    // computed column
    assert(df.where(abs(col("total") - col("qty") * col("price")) > 1e-9).count() == 0)
    df.unpersist()
  }

  test("categorical weights approximately honored") {
    val df = Generator.generate(spark, 20000L, specs, seed = 2L)
    val counts = df.groupBy("category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("alpha") / 20000.0 - 0.5) < 0.02)
    assert(math.abs(counts("beta") / 20000.0 - 0.3) < 0.02)
  }

  test("parallelism invariance: identical output at 3 vs 17 partitions") {
    val a = Generator.generate(spark, 2000L, specs, seed = 3L, partitions = 3)
      .collect().map(_.toString).sorted
    val b = Generator.generate(spark, 2000L, specs, seed = 3L, partitions = 17)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("faker templates: every supported directive compiles and draws from its lexicon") {
    val fields = Faker.supportedKeys.zipWithIndex.map { case (k, i) =>
      TemplateField(s"f$i", s"#{$k}")
    }
    val df = Generator.generate(spark, 500L, fields, seed = 5L).cache()
    assert(df.where(fields.map(f => col(f.name).isNull || length(col(f.name)) === 0)
      .reduce(_ || _)).count() == 0)
    // spot semantic checks
    val row = df.select(
      col(s"f${Faker.supportedKeys.indexOf("name.firstname")}"),
      col(s"f${Faker.supportedKeys.indexOf("internet.emailaddress")}"),
      col(s"f${Faker.supportedKeys.indexOf("finance.creditcard")}")).head()
    assert(Faker.FirstNames.contains(row.getString(0)))
    assert(row.getString(1).matches("[a-z]+\\.[a-z]+@[a-z.]+"))
    assert(row.getString(2).matches("[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}"))
    df.unpersist()
  }

  test("faker templates: repeated directives draw independently; literals pass through") {
    val df = Generator.generate(spark, 2000L,
      Seq(TemplateField("pair", "#{Name.firstName}|#{Name.firstName}")), seed = 6L)
    val parts = df.select(split(col("pair"), "\\|").as("p"))
    // if the two draws aliased, every row would have p[0] == p[1]
    val differing = parts.where(col("p")(0) =!= col("p")(1)).count()
    assert(differing > 1500, s"only $differing/2000 rows differ — draws are aliased")
    val lit2 = Generator.generate(spark, 10L,
      Seq(TemplateField("t", "hello #{Address.city}, bye")), seed = 7L)
    assert(lit2.where(!col("t").rlike("^hello .*, bye$")).count() == 0)
  }

  test("faker templates: deterministic and parallelism-invariant; bad templates rejected") {
    val s1 = Generator.generate(spark, 1000L,
      Seq(TemplateField("x", "#{Company.name}")), seed = 8L, partitions = 3)
      .collect().map(_.getString(0)).sorted
    val s2 = Generator.generate(spark, 1000L,
      Seq(TemplateField("x", "#{Company.name}")), seed = 8L, partitions = 13)
      .collect().map(_.getString(0)).sorted
    assert(s1.sameElements(s2))
    intercept[IllegalArgumentException](TemplateField("x", "#{Bogus.key}"))
    intercept[IllegalArgumentException](TemplateField("x", "no directives"))
  }

  test("null probability applied") {
    val df = Generator.generate(spark, 10000L, specs, seed = 4L,
      nullProb = Map("qty" -> 0.2))
    val nulls = df.where(col("qty").isNull).count()
    assert(math.abs(nulls / 10000.0 - 0.2) < 0.02)
  }

  test("cross-spec references see the POST-null referenced column") {
    // 'body' is a LATE spec (carries nested sql) whose plain path
    // body.customer_id is read by a sibling sql — and body has a null
    // probability. The stage-A pre-staged subset must carry the SAME null
    // draw as the final column, or 'key' would read values from rows
    // where body is null in the output (and the result would flip with
    // declaration order).
    val body = StructSpec("body", Seq(
      RegexField("customer_id", "CUST[0-9]{4}"),
      SqlField("upper_id", "UPPER(body.customer_id)")))
    val key = SqlField("key", "body.customer_id")
    val df = Generator.generate(spark, 4000L, Seq(key, body), seed = 11L,
      nullProb = Map("body" -> 0.3)).cache()
    assert(math.abs(df.where(col("body").isNull).count() / 4000.0 - 0.3) < 0.03)
    // key is null exactly where body is null, equal to its id elsewhere
    assert(df.where(col("body").isNull && col("key").isNotNull).count() == 0)
    assert(df.where(col("body").isNotNull &&
      (col("key") =!= col("body.customer_id"))).count() == 0)
    df.unpersist()
  }

  test("fan-out emits lo..hi children per parent") {
    val base = Generator.generate(spark, 1000L, Seq(SequentialField("pid", "P", 6)), seed = 5L)
    val kids = Generator.fanOut(base, "pid", 1, 4)
    val perParent = kids.groupBy("pid").count()
    assert(perParent.where(col("count") < 1 || col("count") > 4).count() == 0)
    val total = kids.count()
    assert(total >= 1000 && total <= 4000)
  }

  test("RegexField: generated strings all match the pattern; deterministic across partitions") {
    val pattern = "(ab|cd|ef)[A-Z]{2}-[0-9]{2,4}x?\\d+"
    val fields = Seq(SequentialField("id", "G", 6), RegexField("code", pattern))
    val df = Generator.generate(spark, 3000L, fields, seed = 13L).cache()
    val re = java.util.regex.Pattern.compile("^(ab|cd|ef)[A-Z]{2}-[0-9]{2,4}x?[0-9]+$")
    val codes = df.select("code").as[String].collect()
    codes.foreach(c => assert(re.matcher(c).matches(), s"'$c' does not match $pattern"))
    // both quantifier branches + variable lengths actually exercised
    assert(codes.map(_.length).distinct.length > 2)
    assert(codes.exists(_.contains("x")) && codes.exists(!_.contains("x")))
    assert(codes.count(_.startsWith("ab")) > 0 && codes.count(_.startsWith("ef")) > 0)
    val b = Generator.generate(spark, 3000L, fields, seed = 13L, partitions = 17)
      .select("code").as[String].collect()
    assert(codes.sorted.sameElements(b.sorted))
    df.unpersist()
  }

  test("nested struct/array generation: path-keyed randomness, computed-column topo order") {
    val nested = Seq(
      SequentialField("id", "N", 6),
      StructSpec("addr", Seq(
        OneOfField("city", Seq(("sf", 0.5), ("nyc", 0.5))),
        IntField("zip", 10000, 99999))),
      ArraySpec("scores", IntField("s", 0, 100), 1, 4),
      // computed fields listed in REVERSE dependency order on purpose
      SqlField("d", "c * 2"),
      SqlField("c", "addr.zip + size(scores)"))
    val df = Generator.generate(spark, 2000L, nested, seed = 21L).cache()
    assert(df.schema("addr").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(df.where(!col("addr.city").isin("sf", "nyc")).count() == 0)
    assert(df.where(!col("addr.zip").between(10000, 99999)).count() == 0)
    assert(df.where(size(col("scores")) < 1 || size(col("scores")) > 4).count() == 0)
    assert(df.select(size(col("scores"))).distinct().count() == 4) // all lengths drawn
    assert(df.where(col("c") =!= col("addr.zip") + size(col("scores"))).count() == 0)
    assert(df.where(col("d") =!= col("c") * 2).count() == 0)
    // sibling fields and array positions draw independent randomness
    assert(df.where(element_at(col("scores"), 1) === col("addr.zip") % 101).count() < 2000)
    // AlphaNum content is path-keyed: same-named fields in different structs
    // and different array positions produce different strings
    val an = Generator.generate(spark, 300L, Seq(
      StructSpec("a", Seq(AlphaNumField("s", 8, 8))),
      StructSpec("b", Seq(AlphaNumField("s", 8, 8))),
      ArraySpec("arr", AlphaNumField("t", 8, 8), 3, 3)), seed = 4L)
    assert(an.where(col("a.s") === col("b.s")).count() == 0)
    assert(an.where(element_at(col("arr"), 1) === element_at(col("arr"), 2)).count() == 0)
    // cycles rejected
    intercept[IllegalArgumentException] {
      Generator.generate(spark, 10L,
        Seq(IntField("x", 1, 2), SqlField("a", "b + 1"), SqlField("b", "a + 1"))).collect()
    }
    df.unpersist()
  }

  test("RegexField fuzz: random patterns from the supported grammar always self-match") {
    val rng = new scala.util.Random(99)
    def randClass(): String = {
      val opts = Seq("[A-Z]", "[a-z]", "[0-9]", "[A-Fa-f0-9]", "\\d", "\\w", "[x-z_-]")
      opts(rng.nextInt(opts.size))
    }
    def randQuant(): String = rng.nextInt(5) match {
      case 0 => ""
      case 1 => s"{${1 + rng.nextInt(4)}}"
      case 2 => { val m = rng.nextInt(3); s"{$m,${m + 1 + rng.nextInt(3)}}" }
      case 3 => "?"
      case 4 => "+"
    }
    def randPart(): String = rng.nextInt(4) match {
      case 0 => randClass() + randQuant()
      case 1 => Seq("AB", "x", "-", ".", "id_")(rng.nextInt(5)).replace(".", "\\.")
      case 2 => s"(${Seq("foo", "ba", "z9").take(1 + rng.nextInt(3)).mkString("|")})" + randQuant()
      case 3 => "\\d" + randQuant()
    }
    (0 until 25).foreach { trial =>
      val pattern = (0 until (1 + rng.nextInt(4))).map(_ => randPart()).mkString
      val javaRe = java.util.regex.Pattern.compile(
        "^" + pattern.replace("+", "{1,8}") + "$") // generator caps unbounded + at 8
      val df = Generator.generate(spark, 200L,
        Seq(RegexField("f", pattern)), seed = trial.toLong)
      df.select("f").as[String].collect().foreach { v =>
        assert(javaRe.matcher(v).matches(), s"trial $trial: '$v' !~ /$pattern/")
      }
    }
  }

  test("RegexField: unsupported constructs fail fast with the construct named") {
    def bad(p: String): String =
      intercept[IllegalArgumentException](RegexField("f", p)).getMessage
    assert(bad("[^abc]").contains("negated"))
    assert(bad("a|b").contains("alternation"))
    assert(bad("a.c").contains("wildcard"))
    assert(bad("[abc").contains("unclosed"))
    assert(bad("(a[b)").contains("non-literal"))
  }

  test("GenBench schema (the reference's benchmark workload) generates valid rows") {
    val df = Generator.generate(spark, 2000L, graft.GenBench.specs, seed = 1L).cache()
    assert(df.where(!col("account_id").rlike("^ACC[0-9]{8}$")).count() == 0)
    assert(df.where(!col("balance").between(10.0, 1000.0)).count() == 0)
    assert(df.where(col("year") =!= year(col("date"))).count() == 0)
    assert(df.where(size(col("update_history")) < 1 || size(col("update_history")) > 5).count() == 0)
    assert(df.where(!col("status").isin("open", "closed", "pending", "suspended")).count() == 0)
    // status really is the newest update's status
    assert(df.where(col("status") =!=
      element_at(sort_array(col("update_history"), asc = false), 1).getField("status")).count() == 0)
    assert(df.where(!col("customer_details.age").between(18, 90)).count() == 0)
    df.unpersist()
  }

  test("FK assignKeys: every target key comes from the source domain, deterministically") {
    val source = Seq("n1", "n2", "n3", "n4").toDF("nation")
    val target = Generator.generate(spark, 3000L, Seq(SequentialField("id", "T", 6)), seed = 6L)
      .withColumn("nation", lit(null).cast("string"))
    val assigned = ForeignKeys.assignKeys(target, "id", "nation", source, "nation")
    assert(assigned.where(col("nation").isNull).count() == 0)
    assert(assigned.where(!col("nation").isin("n1", "n2", "n3", "n4")).count() == 0)
    // deterministic re-run
    val again = ForeignKeys.assignKeys(target, "id", "nation", source, "nation")
      .select("id", "nation").collect().map(_.toString).sorted
    assert(again.sameElements(assigned.select("id", "nation").collect().map(_.toString).sorted))
  }

  test("insert/delete order respects the FK graph; cycles rejected") {
    val tables = Seq("orders", "customer", "nation", "lineitem")
    val edges = Seq("nation" -> "customer", "customer" -> "orders", "orders" -> "lineitem")
    val order = ForeignKeys.insertOrder(tables, edges)
    assert(order.indexOf("nation") < order.indexOf("customer"))
    assert(order.indexOf("customer") < order.indexOf("orders"))
    assert(order.indexOf("orders") < order.indexOf("lineitem"))
    assert(ForeignKeys.deleteOrder(tables, edges) == order.reverse)
    intercept[IllegalArgumentException] {
      ForeignKeys.insertOrder(Seq("a", "b"), Seq("a" -> "b", "b" -> "a"))
    }
  }

  test("deleteTracked removes exactly the tracked keys") {
    val table = (1 to 100).toDF("k")
    val tracked = Seq(5, 10, 15).toDF("k")
    val remaining = ForeignKeys.deleteTracked(table, tracked, Seq("k"))
    assert(remaining.count() == 97)
    assert(remaining.where(col("k").isin(5, 10, 15)).count() == 0)
  }

  test("element-scoped sql: siblings resolve per element, not per row") {
    // the reference's multi-level lambda rewriting semantics
    // (GeneratorUtil.scala:275-414): `txns.amount` inside a txns element
    // means THIS element's amount. Row-scoped sql cannot produce this —
    // `flag` must differ across elements of the same row.
    val specs = Seq(
      IntField("base", 1000, 9999),
      ArraySpec("txns", StructSpec("element", Seq(
        IntField("amount", -5000, 5000),
        SqlField("flag", "CASE WHEN txns.amount > 0 THEN 'CREDIT' ELSE 'DEBIT' END"),
        // chained: references the COMPUTED sibling
        SqlField("tag", "concat(txns.flag, '!')"),
        // nested struct referencing the outer element scope AND a frame column
        StructSpec("meta", Seq(
          SqlField("echo", "txns.flag"),
          SqlField("rowref", "base + 1"))))), 3, 6))
    val df = Generator.generate(spark, 500L, specs, seed = 7L).cache()
    // per-element correctness: every element's flag matches ITS amount
    val bad = df.select(explode(col("txns")).as("t"))
      .where(col("t.flag") =!= when(col("t.amount") > 0, "CREDIT").otherwise("DEBIT"))
    assert(bad.count() == 0)
    // chaining and nested-echo hold per element
    val t = df.select(explode(col("txns")).as("t"), col("base"))
    assert(t.where(col("t.tag") =!= concat(col("t.flag"), lit("!"))).count() == 0)
    assert(t.where(col("t.meta.echo") =!= col("t.flag")).count() == 0)
    assert(t.where(col("t.meta.rowref") =!= col("base") + 1).count() == 0)
    // the distinguishing assertion: rows whose elements carry BOTH flags
    // exist (row-scoped sql would give every element the same flag)
    val mixed = df.where(size(array_distinct(col("txns.flag"))) === 2).count()
    assert(mixed > 0, "no row has mixed CREDIT/DEBIT flags — sql is row-scoped")
    df.unpersist()
  }

  test("element-scoped sql: two-level nesting with inner/outer references") {
    // organizations[].departments[].{budget, spend, over} where `over`
    // references the INNER element (departments.spend) and an OUTER
    // element field (organizations.cap) — the reference's per-depth
    // lambda variables (x, y) re-expressed via the scope chain.
    val specs = Seq(
      ArraySpec("organizations", StructSpec("element", Seq(
        IntField("cap", 100, 200),
        SqlField("capx", "organizations.cap * 10"),
        ArraySpec("departments", StructSpec("element", Seq(
          IntField("budget", 0, 3000),
          SqlField("spend", "departments.budget * 2"),
          SqlField("over", "departments.spend > organizations.cap * 10"))), 2, 3))), 2, 3))
    val df = Generator.generate(spark, 300L, specs, seed = 11L).cache()
    val o = df.select(explode(col("organizations")).as("o"))
    assert(o.where(col("o.capx") =!= col("o.cap") * 10).count() == 0)
    val d = o.select(col("o.cap").as("cap"), explode(col("o.departments")).as("d"))
    assert(d.where(col("d.spend") =!= col("d.budget") * 2).count() == 0)
    assert(d.where(col("d.over") =!= (col("d.spend") > col("cap") * 10)).count() == 0)
    // both branches of `over` occur (per-element, per-org resolution real)
    assert(d.select("d.over").distinct().count() == 2)
    // lambda-bound names are left alone: aggregate over the inner array
    val specs2 = Seq(
      ArraySpec("orders", StructSpec("element", Seq(
        ArraySpec("items", StructSpec("element", Seq(
          IntField("qty", 1, 5),
          IntField("price", 1, 100),
          SqlField("line", "items.qty * items.price"))), 2, 4),
        SqlField("total", "aggregate(orders.items, 0L, (acc, x) -> acc + x.line)"))), 1, 2))
    val df2 = Generator.generate(spark, 200L, specs2, seed = 13L)
    val ord = df2.select(explode(col("orders")).as("o"))
      .select(col("o.total").as("total"),
        aggregate(col("o.items"), lit(0L), (acc, x) => acc + x.getField("line")).as("expect"))
    assert(ord.where(col("total") =!= col("expect")).count() == 0)
  }

  test("element-scoped sql: three-level nesting (reference lambda depths x,y,z)") {
    // regions[].stores[].skus[].markup references the depth-3 element
    // (skus.cost), the depth-2 element (stores.factor) and the depth-1
    // element (regions.tax) in one expression — the reference rewrites
    // this with three lambda variables (GeneratorUtil.scala:420-426
    // allocates x,y,z,w per depth); here each array position substitutes
    // the enclosing scopes' expressions directly.
    val specs = Seq(
      ArraySpec("regions", StructSpec("element", Seq(
        IntField("tax", 1, 9),
        ArraySpec("stores", StructSpec("element", Seq(
          IntField("factor", 2, 4),
          ArraySpec("skus", StructSpec("element", Seq(
            IntField("cost", 10, 99),
            SqlField("markup",
              "skus.cost * stores.factor + regions.tax"))), 1, 3))), 1, 3))), 1, 3))
    val df = Generator.generate(spark, 150L, specs, seed = 17L)
    val flat = df.select(explode(col("regions")).as("r"))
      .select(col("r.tax").as("tax"), explode(col("r.stores")).as("s"))
      .select(col("tax"), col("s.factor").as("factor"), explode(col("s.skus")).as("k"))
    assert(flat.count() > 150)
    assert(flat.where(
      col("k.markup") =!= (col("k.cost") * col("factor") + col("tax"))).count() == 0)
    // values vary per element at every depth (not row-constant)
    assert(flat.select("k.markup").distinct().count() > 20)
  }

  test("bounded-unroll arrays reject maxLen beyond the limit loudly") {
    // each unrolled position is one column expression: a 10k-element array
    // would build a 10k-expression tree (Janino/driver blowup) — the plan
    // build must fail with the limit named, not melt down downstream
    val e = intercept[IllegalArgumentException] {
      Generator.generate(spark, 10L,
        Seq(ArraySpec("big", IntField("x", 1, 5), 0, 10000)), seed = 1L)
    }
    assert(e.getMessage.contains("bounded-unroll") && e.getMessage.contains("10000"))
    val ok = Generator.generate(spark, 3L,
      Seq(ArraySpec("ok", IntField("x", 1, 5), 0, 100)), seed = 1L)
    assert(ok.count() == 3)
  }
}
