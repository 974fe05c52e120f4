package graft.rules

import graft.generator._

/** Minimal proto3 SCHEMA-TEXT parser → generation specs — the registry
  * half of the reference's `core/parser/ProtobufParser.scala` (which leans
  * on the protobuf runtime; absent here, so the schema grammar subset that
  * Confluent registries actually serve is parsed directly):
  *
  *   syntax/package/import headers, `message` blocks (nested), `enum`
  *   blocks (nested or top-level), scalar fields with `optional` /
  *   `repeated` labels, `map<K,V>` fields, and `oneof` groups (each branch
  *   becomes an optional field — the JSON mapping's shape).
  *
  * Type references resolve by simple name across the schema AND any
  * supplied imports (registry `references` — the reference fetches
  * referenced subjects the same way). Field options (`[...]`),
  * `reserved`, and `service` blocks are skipped. Proto2 `required` and
  * extensions are not (proto3-only, like the registry default).
  */
object Proto3Schema {

  final case class PField(
      name: String,
      typeName: String,
      repeated: Boolean,
      optional: Boolean,
      mapKey: Option[String])

  final case class PMessage(name: String, fields: Seq[PField])

  final case class Parsed(
      messages: Map[String, PMessage],
      enums: Map[String, Seq[String]],
      /** declaration order of top-level messages (the generation root is
        * the first one, like the reference's name-keyed lookup default). */
      order: Seq[String])

  // ---------- tokenizer ----------

  private def tokenize(text: String): List[String] = {
    val noBlock = text.replaceAll("(?s)/\\*.*?\\*/", " ")
    val noLine = noBlock.replaceAll("//[^\n]*", " ")
    val buf = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    val s = noLine
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val end = s.indexOf('"', i + 1)
        require(end > 0, "unterminated string literal in proto schema")
        buf += s.substring(i, end + 1)
        i = end + 1
      } else if (c.isLetterOrDigit || c == '_' || c == '.') {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '.')) i += 1
        buf += s.substring(start, i)
      } else { buf += c.toString; i += 1 }
    }
    buf.toList
  }

  // ---------- recursive-descent parse ----------

  def parse(text: String, imports: Seq[String] = Nil): Parsed = {
    val messages = scala.collection.mutable.LinkedHashMap[String, PMessage]()
    val enums = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    val order = scala.collection.mutable.ArrayBuffer[String]()
    (imports :+ text).foreach { t =>
      val topLevel = parseOne(tokenize(t), messages, enums)
      if (t eq text) order ++= topLevel
    }
    Parsed(messages.toMap, enums.toMap, order.toSeq)
  }

  /** Parses one schema text into the shared tables; returns its top-level
    * message names in declaration order. */
  private def parseOne(tokens0: List[String],
      messages: scala.collection.mutable.Map[String, PMessage],
      enums: scala.collection.mutable.Map[String, Seq[String]]): Seq[String] = {
    var tokens = tokens0
    val top = scala.collection.mutable.ArrayBuffer[String]()
    def skipTo(stop: String): Unit = {
      while (tokens.nonEmpty && tokens.head != stop) tokens = tokens.tail
      if (tokens.nonEmpty) tokens = tokens.tail
    }
    def skipBalancedBlock(): Unit = { // from just after '{'
      var depth = 1
      while (tokens.nonEmpty && depth > 0) {
        if (tokens.head == "{") depth += 1
        if (tokens.head == "}") depth -= 1
        tokens = tokens.tail
      }
    }

    def qualify(scope: String, name: String): String =
      if (scope.isEmpty) name else s"$scope.$name"

    def parseEnum(scope: String): Unit = {
      val name = tokens.head; tokens = tokens.tail
      require(tokens.head == "{", s"enum $name: expected '{'"); tokens = tokens.tail
      val symbols = scala.collection.mutable.ArrayBuffer[String]()
      while (tokens.head != "}") {
        tokens.head match {
          case "option" | "reserved" => skipTo(";")
          case sym =>
            tokens = tokens.tail // symbol
            require(tokens.head == "=", s"enum $name: expected '=' after $sym")
            skipTo(";")
            symbols += sym
        }
      }
      tokens = tokens.tail // '}'
      // registered under the PARENT-QUALIFIED name (proto3 scoping) — two
      // parents may each declare a nested `Status`; only the same
      // qualified name redeclared with a different body is a conflict
      val q = qualify(scope, name)
      require(!enums.contains(q) || enums(q) == symbols.toSeq,
        s"enum '$q' declared twice with different symbols")
      enums(q) = symbols.toSeq
    }

    def parseField(fields: scala.collection.mutable.ArrayBuffer[PField],
        forcedOptional: Boolean): Unit = {
      var repeated = false
      var optional = forcedOptional
      if (tokens.head == "repeated") { repeated = true; tokens = tokens.tail }
      else if (tokens.head == "optional") { optional = true; tokens = tokens.tail }
      if (tokens.head == "map") {
        tokens = tokens.tail
        require(tokens.head == "<", "map field: expected '<'"); tokens = tokens.tail
        val k = tokens.head; tokens = tokens.tail
        require(tokens.head == ",", "map field: expected ','"); tokens = tokens.tail
        val v = tokens.head; tokens = tokens.tail
        require(tokens.head == ">", "map field: expected '>'"); tokens = tokens.tail
        val name = tokens.head; tokens = tokens.tail
        skipTo(";")
        fields += PField(name, v, repeated = true, optional = false, mapKey = Some(k))
      } else {
        val typ = tokens.head; tokens = tokens.tail
        val name = tokens.head; tokens = tokens.tail
        require(tokens.head == "=", s"field $name: expected '='")
        skipTo(";")
        fields += PField(name, typ, repeated, optional, None)
      }
    }

    def parseMessage(scope: String): String = {
      val name = tokens.head; tokens = tokens.tail
      val q = qualify(scope, name)
      require(tokens.head == "{", s"message $name: expected '{'"); tokens = tokens.tail
      val fields = scala.collection.mutable.ArrayBuffer[PField]()
      while (tokens.head != "}") {
        tokens.head match {
          case "message" => tokens = tokens.tail; parseMessage(q)
          case "enum" => tokens = tokens.tail; parseEnum(q)
          case "oneof" =>
            tokens = tokens.tail // keyword
            tokens = tokens.tail // group name
            require(tokens.head == "{", "oneof: expected '{'"); tokens = tokens.tail
            while (tokens.head != "}") {
              // option statements are legal inside oneof blocks too
              if (tokens.head == "option") skipTo(";")
              else parseField(fields, forcedOptional = true)
            }
            tokens = tokens.tail // '}'
          case "option" | "reserved" => skipTo(";")
          case _ => parseField(fields, forcedOptional = false)
        }
      }
      tokens = tokens.tail // '}'
      val built = PMessage(q, fields.toSeq)
      require(!messages.contains(q) || messages(q) == built,
        s"message '$q' declared twice with different fields")
      messages(q) = built
      q
    }

    while (tokens.nonEmpty) {
      tokens.head match {
        case "syntax" | "package" | "import" | "option" => tokens = tokens.tail; skipTo(";")
        case "message" => tokens = tokens.tail; top += parseMessage("")
        case "enum" => tokens = tokens.tail; parseEnum("")
        case "service" =>
          tokens = tokens.tail; tokens = tokens.tail // name
          require(tokens.head == "{", "service: expected '{'"); tokens = tokens.tail
          skipBalancedBlock()
        case ";" => tokens = tokens.tail
        case other => throw new IllegalArgumentException(
          s"proto3 parse: unexpected top-level token '$other'")
      }
    }
    top.toSeq
  }

  // ---------- specs ----------

  private val IntTypes = Set("int32", "int64", "sint32", "sint64", "uint32",
    "uint64", "fixed32", "fixed64", "sfixed32", "sfixed64")

  /** Proto3 name resolution: a reference inside message scope `A.B` tries
    * `A.B.T`, `A.T`, `T` (innermost scope outward — proto3 semantics),
    * then falls back to a UNIQUE simple-name suffix match anywhere in the
    * schema (so a package-qualified `pkg.Type` reference still resolves);
    * an ambiguous simple reference throws, never picks silently.
    */
  private def lookup[T](table: Map[String, T], scope: String, t: String): Option[T] = {
    val parts = scope.split('.').filter(_.nonEmpty)
    val scoped = (parts.indices.reverse.map(i => parts.take(i + 1).mkString(".") + "." + t)
      :+ t).collectFirst { case k if table.contains(k) => table(k) }
    scoped.orElse {
      val simple = t.split('.').last
      table.keys.filter(k => k == simple || k.endsWith("." + simple)).toSeq match {
        case Seq(one) => Some(table(one))
        case Nil => None
        case many => throw new IllegalArgumentException(
          s"type reference '$t' is ambiguous (${many.sorted.mkString(", ")}) — " +
            "qualify the reference")
      }
    }
  }

  /** The message's generation specs + nullable hints (optional/oneof
    * fields). `root` defaults to the first top-level message; a simple
    * name resolves against the qualified table. */
  def toSpecs(p: Parsed, root: String = ""): (Seq[FieldSpec], Map[String, Double]) = {
    val rootName = if (root.nonEmpty) root
      else p.order.headOption.getOrElse(
        throw new IllegalArgumentException("proto schema declares no message"))
    val msg = lookup(p.messages, "", rootName).getOrElse(
      throw new IllegalArgumentException(s"message '$rootName' not found " +
        s"(have: ${p.messages.keys.toSeq.sorted.mkString(", ")})"))
    val specs = msg.fields.map(f => fieldSpec(f, p, depth = 0, scope = msg.name))
    val nullable = msg.fields.collect { case f if f.optional => f.name -> 0.1 }.toMap
    (specs, nullable)
  }

  private def fieldSpec(f: PField, p: Parsed, depth: Int, scope: String): FieldSpec = {
    require(depth < 8, s"field ${f.name}: message nesting exceeds depth 8 " +
      "(recursive message types cannot be generated)")
    def scalar(name: String, t: String): FieldSpec =
      if (IntTypes.contains(t)) IntField(name, 0L, 1000000L)
      else t match {
        case "double" | "float" => DoubleField(name, 0.0, 1000.0)
        case "bool" => OneOfField(name, Seq(("true", 0.5), ("false", 0.5)))
        case "string" => AlphaNumField(name, 5, 12)
        case "bytes" => BytesField(name)
        case other => (lookup(p.enums, scope, other), lookup(p.messages, scope, other)) match {
          case (Some(symbols), _) =>
            OneOfField(name, symbols.map(s => (s, 1.0 / symbols.size)))
          case (None, Some(m)) =>
            StructSpec(name, m.fields.map(c => fieldSpec(c, p, depth + 1, scope = m.name)))
          case _ => throw new IllegalArgumentException(
            s"field $name: unresolved proto type '$other'")
        }
      }
    f.mapKey match {
      case Some(k) =>
        // proto maps are repeated key-value entries on the wire — generate
        // that shape: array<struct<key, value>>
        ArraySpec(f.name,
          StructSpec("entry", Seq(scalar("key", k), scalar("value", f.typeName))), 0, 3)
      case None if f.repeated => ArraySpec(f.name, scalar("element", f.typeName), 0, 3)
      case None => scalar(f.name, f.typeName)
    }
  }
}
