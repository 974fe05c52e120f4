package graft.plan

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Property fuzz for the legacy task-file adapter: random reference-style
  * steps (random field options), each parsed and RUN, with every field's
  * declared constraint re-checked on the produced data. Catches adapter
  * drift (an option silently ignored generates data that violates its own
  * declaration).
  */
class LegacyPlanFuzzSpec extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private case class F(name: String, yaml: String, check: org.apache.spark.sql.DataFrame => Boolean)

  private def randomField(i: Int, rnd: scala.util.Random): F = {
    val name = s"f$i"
    rnd.nextInt(6) match {
      case 0 =>
        val pats = Seq("AC[0-9]{4}", "[A-Z]{3}-[0-9]{2}", "u[a-f0-9]{6}")
        val p = pats(rnd.nextInt(pats.size))
        F(name, s"""- {name: $name, options: {regex: "$p"}}""",
          df => df.where(!col(name).rlike(s"^$p$$")).isEmpty)
      case 1 =>
        val vals = (1 to 2 + rnd.nextInt(3)).map(j => s"opt${j}")
        F(name, s"""- {name: $name, options: {oneOf: [${vals.mkString(", ")}]}}""",
          df => df.where(!col(name).isin(vals: _*)).isEmpty)
      case 2 =>
        val lo = rnd.nextInt(100); val hi = lo + 1 + rnd.nextInt(1000)
        F(name, s"""- {name: $name, type: integer, options: {min: $lo, max: $hi}}""",
          df => df.where(col(name) < lo || col(name) > hi).isEmpty)
      case 3 =>
        val lo = rnd.nextDouble() * 10
        val hi = lo + 1 + rnd.nextDouble() * 100
        F(name, s"""- {name: $name, type: double, options: {min: $lo, max: $hi}}""",
          df => df.where(col(name) < lo || col(name) > hi).isEmpty)
      case 4 =>
        val lit = s"const${rnd.nextInt(100)}"
        F(name, s"""- {name: $name, static: "$lit"}""",
          df => df.where(col(name) =!= lit).isEmpty)
      case _ =>
        F(name, s"""- {name: $name, options: {isUnique: true}}""",
          df => df.select(name).distinct().count() == df.count())
    }
  }

  test("20 random legacy steps: parsed data obeys every declared field option") {
    val rnd = new scala.util.Random(817L)
    (1 to 20).foreach { iter =>
      val n = 50 + rnd.nextInt(150)
      val fields = (1 to 2 + rnd.nextInt(4)).map(randomField(_, rnd))
      val yaml =
        s"""name: fuzz$iter
           |steps:
           |  - name: "step$iter"
           |    count:
           |      records: $n
           |    fields:
           |${fields.map("      " + _.yaml).mkString("\n")}
           |""".stripMargin
      val tasks = LegacyPlan.parseTaskFile(yaml)
      val o = MultiPlanRunner.run(s, MultiPlanSpec(s"fz$iter", 7L + iter, tasks))
      val df = o.frames(s"step$iter").cache()
      assert(df.count() == n, s"iteration $iter: wrong row count")
      fields.foreach { f =>
        assert(f.check(df), s"iteration $iter: field ${f.name} violates its declaration in\n$yaml")
      }
      df.unpersist()
    }
  }
}
