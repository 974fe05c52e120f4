package graft.rules

import graft.generator._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Avro schema (.avsc) importer — the payload format of the reference's
  * Confluent-schema-registry metadata source
  * (`core/generator/metadata/datasource/confluentschemaregistry/`): the
  * registry hands back an Avro record schema and the reference converts it
  * to generation fields. The registry transport is env-blocked here (no
  * broker), but the conversion — the actual logic — is this object, over
  * the same json4s walk as [[JsonSchema]]:
  *
  *  - record → one [[FieldSpec]] per field, nested records → [[StructSpec]];
  *  - primitives: int/long → [[IntField]], float/double → [[DoubleField]],
  *    boolean → boolean, string/bytes → [[AlphaNumField]];
  *  - logical types: `date` → [[DateField]], `timestamp-millis`/`-micros` →
  *    [[TimestampField]], `decimal` → [[DoubleField]];
  *  - enum → [[OneOfField]] over its symbols; fixed(n) → hex string of
  *    length 2n; array → [[ArraySpec]]; map → struct of a bounded key set;
  *  - union `["null", T]` → T with nullability recorded (the caller feeds
  *    [[Generator.generate]]'s `nullProb`); other unions take the first
  *    non-null branch (documented narrowing, as in the reference);
  *  - named-type references resolve against previously-defined records.
  *
  * [[toRules]] emits the matching validation side: notNull for
  * non-nullable fields, enum membership, fixed-length checks.
  */
object AvroSchema {

  final case class Imported(
      specs: Seq[FieldSpec],
      /** field name → null probability hint (0.1) for nullable fields. */
      nullable: Map[String, Double],
      rules: Seq[Rule])

  def parse(text: String): Imported = {
    val root = JsonMethods.parse(text)
    val defined = scala.collection.mutable.Map.empty[String, JValue]
    val fields = (root \ "type", root \ "fields") match {
      case (JString("record"), JArray(fs)) => fs
      case _ => throw new IllegalArgumentException("top-level Avro schema must be a record")
    }
    collectNamed(root, defined)
    val specs = fields.map(f => fieldSpec(fname(f), f \ "type", defined, 0))
    val nullable = fields.flatMap { f =>
      if (isNullableUnion(f \ "type")) Some(fname(f) -> 0.1) else None
    }.toMap
    val rules = fields.flatMap(f => fieldRules(fname(f), f \ "type", defined))
    Imported(specs, nullable, rules)
  }

  private def fname(f: JValue): String = f \ "name" match {
    case JString(n) => n
    case _ => throw new IllegalArgumentException("Avro field without name")
  }

  /** Register named records/enums/fixed so later references resolve. */
  private def collectNamed(node: JValue, defined: scala.collection.mutable.Map[String, JValue]): Unit =
    node match {
      case JObject(_) =>
        (node \ "type", node \ "name") match {
          case (JString("record" | "enum" | "fixed"), JString(n)) => defined(n) = node
          case _ =>
        }
        (node \ "fields") match {
          case JArray(fs) => fs.foreach(f => collectNamed(f \ "type", defined))
          case _ =>
        }
        (node \ "items") match { case JNothing => (); case it => collectNamed(it, defined) }
      case JArray(branches) => branches.foreach(collectNamed(_, defined))
      case _ =>
    }

  private def isNullableUnion(t: JValue): Boolean = t match {
    case JArray(branches) => branches.contains(JString("null"))
    case _ => false
  }

  /** First non-null branch of a union; the type itself otherwise. */
  private def effective(t: JValue): JValue = t match {
    case JArray(branches) => branches.filterNot(_ == JString("null")).headOption.getOrElse(JString("string"))
    case other => other
  }

  private def fieldSpec(name: String, t0: JValue,
      defined: collection.Map[String, JValue], depth: Int): FieldSpec = {
    require(depth < 12, "Avro schema nesting exceeds 12 (cycle?)")
    effective(t0) match {
      case JString(prim) => defined.get(prim) match {
        case Some(named) => fieldSpec(name, named, defined, depth + 1)
        case None => prim match {
          case "int" => IntField(name, 0, 1000000)
          case "long" => IntField(name, 0, 10000000000L)
          case "float" | "double" => DoubleField(name, 0.0, 1.0)
          case "boolean" => OneOfField(name, Seq(("true", 0.5), ("false", 0.5)))
          case _ => AlphaNumField(name, 5, 20) // string | bytes
        }
      }
      case obj @ JObject(_) =>
        (obj \ "logicalType", obj \ "type") match {
          case (JString("date"), _) => DateField(name, "2022-01-01", 365)
          case (JString("timestamp-millis" | "timestamp-micros"), _) =>
            TimestampField(name, "2022-01-01 00:00:00", 365L * 86400)
          case (JString("decimal"), _) => DoubleField(name, 0.0, 1000.0)
          case (_, JString("record")) =>
            val fs = (obj \ "fields") match { case JArray(a) => a; case _ => Nil }
            StructSpec(name, fs.map(f => fieldSpec(fname(f), f \ "type", defined, depth + 1)))
          case (_, JString("enum")) =>
            val syms = (obj \ "symbols") match {
              case JArray(ss) => ss.collect { case JString(s) => s }
              case _ => Nil
            }
            OneOfField(name, syms.map(s => (s, 1.0 / syms.size)))
          case (_, JString("fixed")) =>
            val n = (obj \ "size") match { case JInt(i) => i.toInt; case _ => 16 }
            RegexField(name, s"[0-9a-f]{${2 * n}}")
          case (_, JString("array")) =>
            ArraySpec(name, fieldSpec(name + "_item", obj \ "items", defined, depth + 1), 0, 3)
          case (_, JString("map")) =>
            // bounded deterministic key set — generation needs a schema, and
            // parquet map columns round-trip as k1/k2 struct fields
            StructSpec(name, Seq(
              fieldSpec("k1", obj \ "values", defined, depth + 1),
              fieldSpec("k2", obj \ "values", defined, depth + 1)))
          case _ => AlphaNumField(name, 5, 20)
        }
      case _ => AlphaNumField(name, 5, 20)
    }
  }

  private def fieldRules(name: String, t0: JValue,
      defined: collection.Map[String, JValue]): Seq[Rule] = {
    val req = if (!isNullableUnion(t0)) Seq(Rules.isNotNull(name)) else Nil
    val eff = effective(t0)
    val resolved = eff match {
      case JString(ref) => defined.getOrElse(ref, eff)
      case other => other
    }
    val typed = (resolved \ "type") match {
      case JString("enum") =>
        val syms = (resolved \ "symbols") match {
          case JArray(ss) => ss.collect { case JString(s) => s }
          case _ => Nil
        }
        Seq(Rules.in(name, syms))
      case JString("fixed") =>
        val n = (resolved \ "size") match { case JInt(i) => i.toInt; case _ => 16 }
        Seq(Rules.lengthEqual(name, 2 * n))
      case _ => Nil
    }
    // a nullable field's typed constraint applies only when present —
    // null isin(...) evaluates null, which the strict rule kernel counts
    // as a failure, so the null case must be admitted explicitly
    val guarded =
      if (isNullableUnion(t0)) typed.map(r => Rules.isNull(name) || r)
      else typed
    req ++ guarded
  }
}
