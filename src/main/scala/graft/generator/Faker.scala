package graft.generator

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic faker-style template expansion — the reference's
  * `GENERATE_FAKER_EXPRESSION('#{Name.name}')` UDF surface
  * (`core/generator/DataGeneratorFactory.scala:436-437` registers
  * `faker.expression(s)` as a NONDETERMINISTIC udf; expression syntax
  * validated in `core/exception/Exceptions.scala:63`), recast as pure Column
  * expressions over in-repo public lexicons:
  *
  *  - no UDF: every directive compiles to `element_at(array(lits...), idx)`
  *    draws that stay inside WholeStageCodegen (the reference's own
  *    fast-mode philosophy, `FastDataGenerator.scala:21-128`);
  *  - DETERMINISTIC and parallelism-invariant: each directive occurrence
  *    draws from uniforms keyed by (field, token position, subdraw), so the
  *    same (seed, row) always yields the same string at any partitioning —
  *    the reference's faker UDF cannot replay;
  *  - engine-portable: with [[Generator.portableUniform]] the exact strings
  *    are reproducible in DuckDB SQL (oracle-checked by q32).
  *
  * Directive coverage = every faker expression observed in the reference's
  * own plans/examples (`#{Name.name}`, `#{Name.firstName}`, `#{Name.lastName}`,
  * `#{Name.fullName}`, `#{Address.city}`, `#{Address.country}`,
  * `#{Address.countryCode}`, `#{Address.fullAddress}`,
  * `#{Internet.emailAddress}`, `#{Internet.domainName}`, `#{Company.name}`,
  * `#{Commerce.productName}`, `#{Finance.creditCard}`, `#{Number.digit}`),
  * case-insensitive like datafaker. Unknown directives fail at
  * spec-construction time, mirroring the reference's invalid-expression error.
  */
object Faker {

  // small public lexicons (common names/words; ASCII so lower() is
  // engine-independent). Sizes are part of the determinism contract with the
  // q32 oracle SQL — extend by APPENDING and bumping the oracle together.
  val FirstNames: IndexedSeq[String] = Vector(
    "Alice", "Benjamin", "Carmen", "David", "Elena", "Frank", "Grace", "Hugo",
    "Irene", "James", "Karen", "Luis", "Maria", "Noah", "Olivia", "Peter",
    "Quinn", "Rosa", "Samuel", "Teresa")
  val LastNames: IndexedSeq[String] = Vector(
    "Anderson", "Brown", "Chen", "Davis", "Evans", "Fischer", "Garcia", "Hansen",
    "Ivanov", "Johnson", "Kim", "Lopez", "Miller", "Nguyen", "Olsen", "Patel",
    "Quintero", "Rossi", "Smith", "Taylor")
  val Cities: IndexedSeq[String] = Vector(
    "Amsterdam", "Barcelona", "Chicago", "Dublin", "Edinburgh", "Florence",
    "Geneva", "Hamburg", "Istanbul", "Jakarta", "Kyoto", "Lisbon",
    "Melbourne", "Nairobi", "Oslo", "Prague")
  val Countries: IndexedSeq[String] = Vector(
    "Argentina", "Brazil", "Canada", "Denmark", "Egypt", "France", "Germany",
    "Hungary", "India", "Japan", "Kenya", "Mexico")
  val CountryCodes: IndexedSeq[String] = Vector(
    "AR", "BR", "CA", "DK", "EG", "FR", "DE", "HU", "IN", "JP", "KE", "MX")
  val StreetSuffixes: IndexedSeq[String] = Vector(
    "Street", "Avenue", "Road", "Boulevard", "Lane", "Way", "Court", "Drive")
  val States: IndexedSeq[String] = Vector(
    "Alaska", "California", "Colorado", "Florida", "Georgia", "Iowa",
    "Maine", "Montana", "Nevada", "Ohio", "Texas", "Vermont")
  val Domains: IndexedSeq[String] = Vector(
    "example.com", "example.org", "example.net", "mail.test",
    "post.test", "inbox.test", "web.test", "site.test")
  val CompanySuffixes: IndexedSeq[String] = Vector(
    "Inc", "LLC", "Group", "Labs", "Corp", "Co", "Partners", "Holdings")
  val ProductAdjectives: IndexedSeq[String] = Vector(
    "Small", "Ergonomic", "Rustic", "Intelligent", "Gorgeous", "Incredible",
    "Fantastic", "Practical")
  val ProductMaterials: IndexedSeq[String] = Vector(
    "Steel", "Wooden", "Concrete", "Plastic", "Cotton", "Granite", "Rubber",
    "Leather")
  val ProductNames: IndexedSeq[String] = Vector(
    "Chair", "Car", "Computer", "Gloves", "Pants", "Shirt", "Table", "Shoes")
  /** Generic UA strings (format-shaped, not real browser builds). */
  val UserAgents: IndexedSeq[String] = Vector(
    "Mozilla/5.0 (X11; Linux x86_64) TestBrowser/1.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) TestBrowser/2.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15) TestBrowser/3.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 16_0 like Mac OS X) TestMobile/1.0",
    "Mozilla/5.0 (Linux; Android 13) TestMobile/2.0",
    "TestBot/1.0 (+https://example.com/bot)")

  sealed trait Token
  final case class Lit(s: String) extends Token
  final case class Directive(key: String) extends Token

  private val directiveRe = "#\\{([A-Za-z0-9_.]+)\\}".r // ipV4Address has a digit

  /** Split a template into literal runs and `#{...}` directives; every
    * directive key is validated eagerly (unknown key → IllegalArgumentException
    * naming the supported set, the reference's invalid-expression contract).
    */
  def parse(template: String): Seq[Token] = {
    val out = scala.collection.mutable.ArrayBuffer[Token]()
    var pos = 0
    for (m <- directiveRe.findAllMatchIn(template)) {
      if (m.start > pos) out += Lit(template.substring(pos, m.start))
      val key = m.group(1).toLowerCase
      require(supported(key),
        s"unsupported faker directive '#{${m.group(1)}}' — supported: ${supportedKeys.mkString(", ")}")
      out += Directive(key)
      pos = m.end
    }
    if (pos < template.length) out += Lit(template.substring(pos))
    require(out.exists(_.isInstanceOf[Directive]),
      s"template '$template' has no #{...} directive — use a plain literal field instead")
    out.toSeq
  }

  val supportedKeys: Seq[String] = Seq(
    "name.firstname", "name.lastname", "name.name", "name.fullname",
    "name.username",
    "address.city", "address.country", "address.countrycode",
    "address.fulladdress", "address.streetaddress", "address.zipcode",
    "address.state",
    "internet.emailaddress", "internet.domainname", "internet.url",
    "internet.ipv4address", "internet.useragentany",
    "phonenumber.phonenumber",
    "company.name", "commerce.productname", "finance.creditcard",
    "number.digit")
  private def supported(key: String): Boolean = supportedKeys.contains(key)

  /** Index into a lexicon with a [0,1) uniform: truncation == floor (u >= 0),
    * 1-based for element_at. */
  private def pick(words: Seq[String], u: Column): Column =
    element_at(array(words.map(lit): _*), (u * words.size).cast("int") + 1)

  /** Compile one directive; `u(sub)` supplies an independent uniform per
    * subdraw (one directive can draw several lexicons, e.g. emailAddress).
    */
  def directiveColumn(key: String, u: String => Column): Column = key match {
    case "name.firstname" => pick(FirstNames, u("f"))
    case "name.lastname" => pick(LastNames, u("l"))
    case "name.name" | "name.fullname" =>
      concat(pick(FirstNames, u("f")), lit(" "), pick(LastNames, u("l")))
    case "address.city" => pick(Cities, u("c"))
    case "address.country" => pick(Countries, u("k"))
    case "address.countrycode" => pick(CountryCodes, u("k"))
    case "address.fulladdress" | "address.streetaddress" =>
      concat(((u("n") * 999).cast("int") + 1).cast("string"), lit(" "),
        pick(LastNames, u("l")), lit(" "), pick(StreetSuffixes, u("s")))
    case "internet.emailaddress" =>
      concat(lower(pick(FirstNames, u("f"))), lit("."),
        lower(pick(LastNames, u("l"))), lit("@"), pick(Domains, u("d")))
    case "internet.domainname" => pick(Domains, u("d"))
    case "company.name" =>
      concat(pick(LastNames, u("l")), lit(" "), pick(CompanySuffixes, u("s")))
    case "commerce.productname" =>
      concat(pick(ProductAdjectives, u("a")), lit(" "),
        pick(ProductMaterials, u("m")), lit(" "), pick(ProductNames, u("p")))
    case "finance.creditcard" =>
      concat_ws("-", (0 until 4).map(g =>
        lpad((u(s"c$g") * 10000).cast("int").cast("string"), 4, "0")): _*)
    case "number.digit" => (u("n") * 10).cast("int").cast("string")
    case "name.username" =>
      concat(lower(substring(pick(FirstNames, u("f")), 1, 1)),
        lower(pick(LastNames, u("l"))),
        ((u("n") * 90).cast("int") + 10).cast("string"))
    case "address.zipcode" =>
      lpad((u("z") * 100000).cast("int").cast("string"), 5, "0")
    case "address.state" => pick(States, u("st"))
    case "internet.url" =>
      concat(lit("https://www."), pick(Domains, u("d")), lit("/"),
        lower(pick(ProductNames, u("p"))))
    case "internet.ipv4address" =>
      concat_ws(".", (0 until 4).map(g =>
        ((u(s"i$g") * 254).cast("int") + 1).cast("string")): _*)
    case "internet.useragentany" => pick(UserAgents, u("ua"))
    case "phonenumber.phonenumber" =>
      concat(lit("("), lpad(((u("a") * 800).cast("int") + 200).cast("string"), 3, "0"),
        lit(") "), lpad((u("e") * 1000).cast("int").cast("string"), 3, "0"),
        lit("-"), lpad((u("s") * 10000).cast("int").cast("string"), 4, "0"))
    case other => throw new IllegalArgumentException(s"unsupported directive $other")
  }
}

