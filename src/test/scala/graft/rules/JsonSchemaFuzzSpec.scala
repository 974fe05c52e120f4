package graft.rules

import graft.SparkSuite
import graft.generator.Generator

/** Property fuzz for the JSON-schema importer: 25 random schemas sampled
  * from a small grammar, each round-tripped — generate data FROM the
  * schema, validate it AGAINST the same schema's rules. Any grammar
  * combination whose generator and validator disagree fails the property
  * (the same self-consistency bar as the regex-generator fuzz).
  */
class JsonSchemaFuzzSpec extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private def randomSchema(rnd: scala.util.Random): String = {
    def prop(depth: Int): String = rnd.nextInt(if (depth == 0) 7 else 5) match {
      case 0 =>
        val lo = rnd.nextInt(1000); val hi = lo + 1 + rnd.nextInt(100000)
        s"""{"type": "integer", "minimum": $lo, "maximum": $hi}"""
      case 1 =>
        val lo = rnd.nextDouble() * 100
        s"""{"type": "number", "minimum": $lo, "maximum": ${lo + 1 + rnd.nextDouble() * 50}}"""
      case 2 =>
        val lo = 1 + rnd.nextInt(5); val hi = lo + rnd.nextInt(15)
        s"""{"type": "string", "minLength": $lo, "maxLength": $hi}"""
      case 3 =>
        val vals = (1 to 2 + rnd.nextInt(4)).map(i => s""""v${rnd.nextInt(100)}_$i"""")
        s"""{"enum": [${vals.mkString(",")}]}"""
      case 4 =>
        // patterns stay in the generator-supported ∩ java-regex subset
        val pats = Seq("[A-Z]{2}[0-9]{3}", "x[a-f]{4}", "(ab|cd)[0-9]{2}", "[0-9]{5}")
        s"""{"type": "string", "pattern": "${pats(rnd.nextInt(pats.size))}"}"""
      case 5 =>
        s"""{"type": "array", "items": ${prop(depth + 1)}, "minItems": ${rnd.nextInt(2)}, "maxItems": ${2 + rnd.nextInt(3)}}"""
      case _ =>
        val kids = (1 to 1 + rnd.nextInt(3)).map(i => s""""n$i": ${prop(depth + 1)}""")
        s"""{"type": "object", "required": ["n1"], "properties": {${kids.mkString(",")}}}"""
    }
    val n = 2 + rnd.nextInt(5)
    val props = (1 to n).map(i => s""""f$i": ${prop(0)}""")
    val reqd = (1 to n).filter(_ => rnd.nextBoolean()).map(i => s""""f$i"""")
    s"""{"type": "object", "required": [${reqd.mkString(",")}], "properties": {${props.mkString(",")}}}"""
  }

  test("25 random schemas: schema-generated data passes the schema's own rules") {
    val rnd = new scala.util.Random(20260817L)
    (1 to 25).foreach { i =>
      val schema = randomSchema(rnd)
      val parsed = JsonSchema.parse(schema)
      val specs = JsonSchema.toFieldSpecs(parsed)
      val rules = JsonSchema.toRules(parsed)
      val df = Generator.generate(s, 120, specs, seed = 1000L + i)
      val failed = RuleEngine.validateAll(df, rules).filterNot(_.success)
      assert(failed.isEmpty,
        s"iteration $i: rules ${failed.map(_.rule)} failed for schema $schema")
    }
  }
}
