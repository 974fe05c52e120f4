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

  test("composite-FK delete lifecycle: children-first keyed DELETEs empty the schema") {
    // fresh database (the round-trip test above leaves rows in its own db)
    val url2 = Jdbc.derbyUrl(
      Files.createTempDirectory("graft_derby_life").toString + "/db")
    def ddl2(statements: String*): Unit = {
      val conn = java.sql.DriverManager.getConnection(url2)
      try statements.foreach(conn.createStatement().executeUpdate)
      finally conn.close()
    }
    ddl2(
      """CREATE TABLE customers (
        |  cust_id INT NOT NULL PRIMARY KEY,
        |  region VARCHAR(2) NOT NULL,
        |  joined DATE NOT NULL,
        |  CONSTRAINT uq_cust2 UNIQUE (cust_id, region)
        |)""".stripMargin,
      """CREATE TABLE orders (
        |  order_id BIGINT NOT NULL PRIMARY KEY,
        |  cust_id INT NOT NULL,
        |  region VARCHAR(2) NOT NULL,
        |  amount DOUBLE NOT NULL,
        |  CONSTRAINT fk_ord2 FOREIGN KEY (cust_id, region)
        |    REFERENCES customers (cust_id, region)
        |)""".stripMargin)

    val tables = JdbcMetadata.discover(url2, "APP")
    val plan = JdbcMetadata.toPlan(tables,
      counts = Map("CUSTOMERS" -> 40L, "ORDERS" -> 300L))
    val o = MultiPlanRunner.run(s, plan)
    Jdbc.write(o.frames("CUSTOMERS"), url2, "APP.CUSTOMERS", org.apache.spark.sql.SaveMode.Append)
    Jdbc.write(o.frames("ORDERS"), url2, "APP.ORDERS", org.apache.spark.sql.SaveMode.Append)

    // track the generated keys: ORDERS by its PK, CUSTOMERS by the
    // COMPOSITE key — the delete must match multi-column tuples
    val folder = Files.createTempDirectory("graft_track_life").toString
    import graft.generator.RecordTracking
    RecordTracking.track(o.frames("ORDERS"), Seq("ORDER_ID"), folder, "p", "ORDERS")
    RecordTracking.track(o.frames("CUSTOMERS"), Seq("CUST_ID", "REGION"), folder, "p", "CUSTOMERS")

    // the ordering MATTERS: parent-first dies on the database's own FK
    // constraint (every batch has at least one referenced customer)
    val e = intercept[Exception] {
      RecordTracking.deleteTrackedFromJdbc(s, url2, "APP.CUSTOMERS", folder, "p", "CUSTOMERS")
    }
    def rootMessages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(rootMessages(e).exists(m =>
      m.contains("FK_ORD2") || m.toLowerCase.contains("foreign key")))

    // children-first (deleteOrder = reverse insert order) empties cleanly;
    // the interrupted parent delete left its tracking state intact, so the
    // retry still has the full key set
    val order = o.insertOrder.reverse
    assert(order == Seq("ORDERS", "CUSTOMERS"))
    val results = order.map(t =>
      t -> RecordTracking.deleteTrackedFromJdbc(s, url2, s"APP.$t", folder, "p", t))
    results.foreach { case (t, r) =>
      assert(r.isDefined, s"$t had no tracking state")
      assert(r.get._2 == 0L, s"$t not empty after delete: ${r.get._2} rows")
    }
    // tracking state dropped with the delete
    assert(RecordTracking.tracked(s, folder, "p", "ORDERS").isEmpty)
    assert(RecordTracking.tracked(s, folder, "p", "CUSTOMERS").isEmpty)
  }

  test("unsupported column types fail loudly, not as random strings") {
    val t = JdbcMetadata.DbTable("APP", "X", Seq(JdbcMetadata.DbColumn(
      "c", java.sql.Types.OTHER, "XML", 0, 0, nullable = true,
      isPk = false, isUnique = false)), Nil)
    val e = intercept[IllegalArgumentException](JdbcMetadata.fieldDefs(t))
    assert(e.getMessage.contains("unsupported JDBC type"))
  }
}
