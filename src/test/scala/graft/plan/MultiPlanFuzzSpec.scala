package graft.plan

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Property fuzz for the multi-task FK machinery: random DAG-shaped plans
  * (random table count, random single- AND multi-column FK edges, random
  * cardinality ratios), each RUN with referential integrity, adjusted
  * counts, and determinism re-checked on the produced frames. Catches
  * drift in insert ordering, composite tuple sampling, and count
  * adjustment that a fixed fixture would miss.
  */
class MultiPlanFuzzSpec extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private def randomPlan(seed: Int): MultiPlanSpec = {
    val rnd = new scala.util.Random(seed)
    val nTables = 3 + rnd.nextInt(3)
    val tasks = (0 until nTables).map { i =>
      TaskDef(s"t$i", 30 + rnd.nextInt(120), Seq(
        FieldDef("id", "sequential", prefix = Some(s"T$i-"), pad = Some(6)),
        FieldDef("cat", "oneOf", values = Some((1 to 2 + rnd.nextInt(3)).map(j => s"c$j"))),
        FieldDef("ref_id", "alphanum"),
        FieldDef("ref_cat", "alphanum"),
        FieldDef("amount", "double", lo = Some(0.0), hi = Some(100.0))))
    }
    // edges only parent i -> child j with i < j: a DAG by construction
    val rels = (1 until nTables).flatMap { j =>
      if (rnd.nextBoolean()) {
        val i = rnd.nextInt(j)
        val composite = rnd.nextBoolean()
        val ratio = if (rnd.nextBoolean()) Some(1.0 + rnd.nextInt(3)) else None
        Some(
          if (composite) RelationshipDef(s"t$j.ref_id,ref_cat", s"t$i.id,cat", ratio)
          else RelationshipDef(s"t$j.ref_id", s"t$i.id", ratio))
      } else None
    }
    MultiPlanSpec(s"fuzz$seed", seed.toLong, tasks, rels)
  }

  test("random DAG plans: integrity, cardinality, determinism hold for every shape") {
    (1 to 8).foreach { seed =>
      val plan = randomPlan(seed)
      val o = MultiPlanRunner.run(s, plan)
      val clue = s"seed=$seed rels=${plan.relationships}"

      // declared-or-adjusted counts are exact
      plan.tasks.foreach { t =>
        assert(o.frames(t.name).count() == o.counts(t.name), clue)
      }
      plan.relationships.foreach { r =>
        val child = o.frames(r.childTable)
        val parent = o.frames(r.parentTable)
        // every sampled tuple exists together in the parent — for the
        // composite case this is the whole point (per-column containment
        // would also pass for fabricated cross-combinations)
        assert(child.join(
          parent.select(r.parentCols.zip(r.childCols).map {
            case (p, c) => col(p).as(c) }: _*).distinct(),
          r.childCols, "left_anti").isEmpty, clue)
        // cardinality ratio drives the child count
        r.ratio.foreach { ratio =>
          assert(o.counts(r.childTable) ==
            math.round(o.counts(r.parentTable) * ratio), clue)
        }
      }
      // deterministic re-run, frame-for-frame (symmetric: equal counts plus
      // one-way multiset containment = multiset equality)
      val again = MultiPlanRunner.run(s, plan)
      plan.tasks.foreach { t =>
        assert(again.frames(t.name).count() == o.counts(t.name), clue)
        assert(o.frames(t.name).exceptAll(again.frames(t.name)).isEmpty, clue)
      }
    }
  }
}
