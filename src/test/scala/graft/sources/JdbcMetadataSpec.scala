package graft.sources

import graft.SparkSuite
import graft.plan.MultiPlanRunner
import graft.rules.RuleEngine
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Create a real schema in embedded Derby (PK, composite FK, NOT NULL,
  * varchar lengths), discover it from the system catalogs, synthesize a
  * plan, generate, validate against the mined constraints, and write the
  * rows back into the database — the reference's database-metadata
  * round-trip (`core/generator/metadata/datasource/database/`).
  */
class JdbcMetadataSpec extends SparkSuite {
  private val s = graft.SharedSpark.spark

  private lazy val url = Jdbc.derbyUrl(
    Files.createTempDirectory("graft_derby_meta").toString + "/db")

  private def ddl(statements: String*): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      statements.foreach(st.executeUpdate)
      st.close()
    } finally conn.close()
  }

  test("discover → plan → generate → validate → write-back round-trip") {
    ddl(
      """CREATE TABLE customers (
        |  cust_id INT NOT NULL PRIMARY KEY,
        |  region VARCHAR(2) NOT NULL,
        |  name VARCHAR(40),
        |  joined DATE NOT NULL,
        |  balance DECIMAL(10,2),
        |  CONSTRAINT uq_cust UNIQUE (cust_id, region)
        |)""".stripMargin,
      """CREATE TABLE orders (
        |  order_id BIGINT NOT NULL PRIMARY KEY,
        |  cust_id INT NOT NULL,
        |  region VARCHAR(2) NOT NULL,
        |  amount DOUBLE NOT NULL,
        |  placed TIMESTAMP,
        |  CONSTRAINT fk_ord FOREIGN KEY (cust_id, region)
        |    REFERENCES customers (cust_id, region)
        |)""".stripMargin)

    val tables = JdbcMetadata.discover(url, "APP")
    assert(tables.map(_.name).sorted == Seq("CUSTOMERS", "ORDERS"))
    val customers = tables.find(_.name == "CUSTOMERS").get
    val orders = tables.find(_.name == "ORDERS").get

    // catalog facts mined correctly: PK/unique, NOT NULL, lengths, types
    val custId = customers.columns.find(_.name == "CUST_ID").get
    assert(custId.isPk && custId.isUnique && !custId.nullable)
    val name = customers.columns.find(_.name == "NAME").get
    assert(name.nullable && name.size == 40)
    // the COMPOSITE FK survives as a field list in declared order
    assert(orders.fks == Seq(JdbcMetadata.DbFk(
      Seq("CUST_ID", "REGION"), "CUSTOMERS", Seq("CUST_ID", "REGION"))))

    // plan runs: parents before children, composite tuples sampled together
    val plan = JdbcMetadata.toPlan(tables, counts = Map("CUSTOMERS" -> 50L, "ORDERS" -> 400L))
    val o = MultiPlanRunner.run(s, plan)
    assert(o.insertOrder == Seq("CUSTOMERS", "ORDERS"))
    val genCust = o.frames("CUSTOMERS")
    val genOrd = o.frames("ORDERS")
    assert(genCust.count() == 50 && genOrd.count() == 400)
    // unique int PK rode the row index: 50 distinct values
    assert(genCust.select("CUST_ID").distinct().count() == 50)
    // composite FK: every (cust_id, region) pair exists together in a parent
    assert(genOrd.join(genCust.select("CUST_ID", "REGION"),
      Seq("CUST_ID", "REGION"), "left_anti").isEmpty)

    // constraint rules mined from the catalog hold on the generated data
    val custRules = JdbcMetadata.rules(customers)
    assert(custRules.map(_.name).exists(_.contains("REGION")))
    assert(RuleEngine.validateAll(genCust, custRules).forall(_.success))
    assert(RuleEngine.validateAll(genOrd, JdbcMetadata.rules(orders)).forall(_.success))

    // and the generated rows INSERT cleanly (types + constraints satisfied
    // for real, judged by the database itself, FK order included)
    Jdbc.write(genCust, url, "APP.CUSTOMERS", org.apache.spark.sql.SaveMode.Append)
    Jdbc.write(genOrd, url, "APP.ORDERS", org.apache.spark.sql.SaveMode.Append)
    assert(Jdbc.read(s, url, "APP.ORDERS").count() == 400)

    // value-stats refinement kicks in once the table holds data
    val profiled = JdbcMetadata.profiledSpecs(s, url, customers)
    assert(profiled.exists(_.nonEmpty))
  }

  test("unsupported column types fail loudly, not as random strings") {
    val t = JdbcMetadata.DbTable("APP", "X", Seq(JdbcMetadata.DbColumn(
      "c", java.sql.Types.OTHER, "XML", 0, 0, nullable = true,
      isPk = false, isUnique = false)), Nil)
    val e = intercept[IllegalArgumentException](JdbcMetadata.fieldDefs(t))
    assert(e.getMessage.contains("unsupported JDBC type"))
  }
}
