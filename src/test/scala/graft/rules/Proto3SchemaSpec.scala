package graft.rules

import graft.SparkSuite
import graft.generator.Generator
import org.apache.spark.sql.functions._

class Proto3SchemaSpec extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private val proto =
    """// full construct coverage
      |syntax = "proto3";
      |package com.example;  /* block
      |                         comment */
      |import "other.proto";
      |option java_package = "com.example.gen";
      |
      |message Event {
      |  int64 id = 1;
      |  string name = 2;
      |  double score = 3;
      |  bool active = 4;
      |  bytes payload = 5;
      |  Level level = 6;
      |  Inner inner = 7;
      |  optional string note = 8;
      |  repeated int32 counts = 9 [packed = true];
      |  map<string, int64> attrs = 10;
      |  oneof target {
      |    int32 option_a = 11;
      |    string option_b = 12;
      |  }
      |  External ext = 13;
      |  message Inner {
      |    string tag = 1;
      |    repeated Level levels = 2;
      |  }
      |  enum Level {
      |    NONE = 0;
      |    LOW = 1;
      |    HIGH = 2;
      |  }
      |}
      |""".stripMargin

  private val imported =
    """syntax = "proto3";
      |message External { string ext_id = 1; }
      |""".stripMargin

  test("proto3 grammar: scalars, enums, nesting, optional, repeated, map, oneof, imports") {
    val p = Proto3Schema.parse(proto, imports = Seq(imported))
    assert(p.order == Seq("Event"))
    assert(p.enums("Event.Level") == Seq("NONE", "LOW", "HIGH")) // parent-qualified
    val (specs, nullable) = Proto3Schema.toSpecs(p)
    assert(specs.map(_.name) == Seq("id", "name", "score", "active", "payload",
      "level", "inner", "note", "counts", "attrs", "option_a", "option_b", "ext"))
    // optional + every oneof branch → nullable hints
    assert(nullable.keySet == Set("note", "option_a", "option_b"))

    val df = Generator.generate(s, 300, specs, seed = 11L, nullProb = nullable)
    assert(df.count() == 300)
    assert(df.where(!col("level").isin("NONE", "LOW", "HIGH")).isEmpty)
    assert(df.where(col("inner.tag").isNull).isEmpty)
    assert(df.select(explode(col("inner.levels")).as("l"))
      .where(!col("l").isin("NONE", "LOW", "HIGH")).isEmpty)
    // map shape: array<struct<key,value>> — the wire representation
    assert(df.select(explode(col("attrs")).as("e"))
      .where(col("e.key").isNull || col("e.value").isNull).isEmpty)
    assert(df.where(col("ext.ext_id").isNull).isEmpty)
    assert(df.where(col("note").isNull).count() > 0) // nullable applied
  }

  test("parent-scoped nested types: two same-named nested messages coexist") {
    // legal proto3 — nested names are scoped to their parent; each parent's
    // field must resolve to ITS OWN Item, innermost scope first
    val p = Proto3Schema.parse(
      """syntax = "proto3";
        |message A { message Item { string x = 1; } Item it = 1; }
        |message B { message Item { int64 y = 1; } Item it = 1; }
        |""".stripMargin)
    val (aSpecs, _) = Proto3Schema.toSpecs(p, root = "A")
    val (bSpecs, _) = Proto3Schema.toSpecs(p, root = "B")
    val aDf = Generator.generate(s, 10, aSpecs, seed = 1L)
    val bDf = Generator.generate(s, 10, bSpecs, seed = 1L)
    assert(aDf.schema("it").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("x"))
    assert(bDf.schema("it").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("y"))
    // an UNSCOPED ambiguous reference still fails loudly, never picks silently
    val amb = Proto3Schema.parse(
      """syntax = "proto3";
        |message A { message Item { string x = 1; } }
        |message B { message Item { int64 y = 1; } }
        |message C { Item it = 1; }
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](Proto3Schema.toSpecs(amb, root = "C"))
    assert(e.getMessage.contains("ambiguous"))
  }

  test("failure modes: unresolved types, no message, recursion, bad tokens") {
    val e = intercept[IllegalArgumentException](
      Proto3Schema.toSpecs(Proto3Schema.parse(
        "syntax = \"proto3\"; message M { Missing x = 1; }")))
    assert(e.getMessage.contains("unresolved proto type 'Missing'"))
    val e2 = intercept[IllegalArgumentException](
      Proto3Schema.toSpecs(Proto3Schema.parse("syntax = \"proto3\";")))
    assert(e2.getMessage.contains("no message"))
    // self-recursive messages can't be generated — loud depth error
    val e3 = intercept[IllegalArgumentException](
      Proto3Schema.toSpecs(Proto3Schema.parse(
        "syntax = \"proto3\"; message Node { Node next = 1; }")))
    assert(e3.getMessage.contains("depth"))
    intercept[IllegalArgumentException](Proto3Schema.parse("not a proto file ="))
  }

  test("the reference's own registered protobuf fixture imports and generates") {
    val dir = java.nio.file.Paths.get(
      "/root/reference/app/src/test/resources/sample/metadata/confluentschemaregistry")
    assume(java.nio.file.Files.exists(dir), "reference checkout not present")
    import graft.util.Jsons.str
    def schemaOf(file: String): String = {
      val j = graft.util.Jsons.parse(
        java.nio.file.Files.readString(dir.resolve(file)))
      str(j \ "schema").get
    }
    // get-example.json registers Proto3AllTypes (nested enum/message, oneof,
    // optional, repeated, map) referencing my-import's ImportExample
    val p = Proto3Schema.parse(schemaOf("get-example.json"),
      imports = Seq(schemaOf("get-my-import.json")))
    val (specs, nullable) = Proto3Schema.toSpecs(p)
    assert(specs.nonEmpty && nullable.nonEmpty)
    val df = Generator.generate(s, 50, specs, seed = 3L, nullProb = nullable)
    assert(df.count() == 50)
    assert(df.where(col("import_example.import").isNull).isEmpty)
    assert(df.where(!col("enum_val").isin("NOTHING", "FIRST", "SECOND")).isEmpty)
  }
}
