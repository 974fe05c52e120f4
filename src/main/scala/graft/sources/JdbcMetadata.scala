package graft.sources

import graft.plan.{FieldDef, MultiPlanSpec, RelationshipDef, TaskDef}
import graft.rules.{Rule, Rules}
import org.apache.spark.sql.SparkSession

/** JDBC catalog discovery → generation plan — the reference's database
  * metadata importers (`core/generator/metadata/datasource/database/
  * {DatabaseMetadata,PostgresMetadata,MysqlMetadata}.scala`): point at a
  * live database, read its system catalogs, and synthesize a plan whose
  * tasks generate type-correct rows for every table, with NOT NULL /
  * length constraints as validation rules and foreign keys as
  * relationships.
  *
  * The reference hand-writes per-dialect `information_schema` SQL (one
  * implementation per engine) and reads it through Spark's JDBC relation.
  * Catalog metadata is a few hundred rows, not data — so here discovery
  * uses the standard `java.sql.DatabaseMetaData` API directly, which every
  * JDBC driver implements (Derby, Postgres, MySQL alike): one code path,
  * no dialect SQL, trivially driver-side like the reference's own
  * `.collect()` of the catalog frame. The GENERATION the plan drives stays
  * fully distributed — discovery only shapes the plan.
  *
  * Composite foreign keys survive: imported keys are grouped by FK name and
  * ordered by key sequence, becoming multi-field [[RelationshipDef]]s that
  * sample the parent's distinct field TUPLE.
  */
object JdbcMetadata {

  final case class DbColumn(
      name: String,
      jdbcType: Int,
      typeName: String,
      size: Int,
      scale: Int,
      nullable: Boolean,
      isPk: Boolean,
      isUnique: Boolean)

  final case class DbFk(childCols: Seq[String], parentTable: String, parentCols: Seq[String])

  final case class DbTable(
      schema: String,
      name: String,
      columns: Seq[DbColumn],
      fks: Seq[DbFk]) {
    def qualified: String = s"$schema.$name"
  }

  /** Read table/column/constraint/FK metadata for every base table matching
    * `schemaPattern` (SQL LIKE syntax, e.g. `"APP"` for Derby's default
    * schema; `"%"` for all).
    */
  def discover(url: String, schemaPattern: String = "%",
      tableFilter: String => Boolean = _ => true): Seq[DbTable] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val md = conn.getMetaData
      val tables = scala.collection.mutable.ArrayBuffer[(String, String)]()
      locally {
        val rs = md.getTables(null, schemaPattern, "%", Array("TABLE"))
        while (rs.next()) {
          val (sch, tab) = (rs.getString("TABLE_SCHEM"), rs.getString("TABLE_NAME"))
          if (tableFilter(tab)) tables += ((sch, tab))
        }
        rs.close()
      }
      tables.toSeq.map { case (sch, tab) =>
        val pks = scala.collection.mutable.Set[String]()
        locally {
          val rs = md.getPrimaryKeys(null, sch, tab)
          while (rs.next()) pks += rs.getString("COLUMN_NAME")
          rs.close()
        }
        // single-column unique indexes (a multi-column unique index does not
        // make any ONE of its columns unique)
        val idxCols = scala.collection.mutable.ArrayBuffer[(String, String)]()
        locally {
          val rs = md.getIndexInfo(null, sch, tab, true, false)
          while (rs.next()) {
            val idx = rs.getString("INDEX_NAME")
            val c = rs.getString("COLUMN_NAME")
            if (idx != null && c != null) idxCols += ((idx, c))
          }
          rs.close()
        }
        val singleColIdx = idxCols.groupBy(_._1).collect {
          case (_, cs) if cs.size == 1 => cs.head._2
        }.toSet
        val cols = scala.collection.mutable.ArrayBuffer[DbColumn]()
        locally {
          val rs = md.getColumns(null, sch, tab, "%")
          while (rs.next()) {
            val c = rs.getString("COLUMN_NAME")
            cols += DbColumn(
              name = c,
              jdbcType = rs.getInt("DATA_TYPE"),
              typeName = rs.getString("TYPE_NAME"),
              size = rs.getInt("COLUMN_SIZE"),
              scale = rs.getInt("DECIMAL_DIGITS"),
              nullable = rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls,
              isPk = pks.contains(c),
              isUnique = pks.contains(c) || singleColIdx.contains(c))
          }
          rs.close()
        }
        // composite FKs: group by FK_NAME, order by KEY_SEQ — the field
        // LISTS feed multi-field RelationshipDefs
        // unnamed FKs (FK_NAME null — some drivers omit it) must NOT merge
        // into one bogus composite key: segment on KEY_SEQ going
        // non-increasing (each FK's rows carry seq 1..k). JDBC orders the
        // result by parent table then KEY_SEQ, so two unnamed COMPOSITE FKs
        // to the SAME parent interleave ambiguously — that case is
        // detected (a segment whose seqs aren't 1..k consecutive) and
        // fails loudly telling the user to name the constraints.
        val fkRows = scala.collection.mutable.ArrayBuffer[(String, Int, String, String, String)]()
        locally {
          val rs = md.getImportedKeys(null, sch, tab)
          var segment = 0
          var prevSeq = Int.MaxValue
          while (rs.next()) {
            val seq = rs.getInt("KEY_SEQ")
            if (seq <= prevSeq) segment += 1
            prevSeq = seq
            fkRows += ((Option(rs.getString("FK_NAME")).getOrElse(s"__unnamed_$segment"),
              seq, rs.getString("FKCOLUMN_NAME"),
              rs.getString("PKTABLE_NAME"), rs.getString("PKCOLUMN_NAME")))
          }
          rs.close()
        }
        val namedFks = fkRows.groupBy(_._1).toSeq.map { case (fkName, rows) =>
          val sorted = rows.sortBy(_._2)
          require(sorted.map(_._2) == (1 to sorted.size),
            s"$sch.$tab: foreign-key rows (${sorted.map(r => r._3 + "->" + r._5).mkString(", ")}) " +
              "don't form consecutive KEY_SEQs — unnamed composite FKs to one parent " +
              "interleave ambiguously; name the constraints to import them")
          fkName -> DbFk(sorted.map(_._3).toSeq, sorted.head._4, sorted.map(_._5).toSeq)
        }
        // JDBC orders getImportedKeys by parent table then KEY_SEQ, so when
        // TWO unnamed FKs target the SAME parent and either is composite,
        // their rows interleave within equal seqs in driver-dependent order
        // — segmentation may pair the wrong columns while still passing the
        // consecutive-seq check. Unresolvable without names: fail loudly.
        locally {
          val ambiguous = namedFks
            .collect { case (n, fk) if n.startsWith("__unnamed_") => fk }
            .groupBy(_.parentTable)
            .collect { case (parent, gs) if gs.size > 1 && gs.exists(_.childCols.size > 1) => parent }
          require(ambiguous.isEmpty,
            s"$sch.$tab: multiple UNNAMED foreign keys to parent(s) " +
              s"${ambiguous.mkString(", ")} include a composite key — row order is " +
              "driver-dependent and the column pairing is ambiguous; name the constraints")
        }
        val fks = namedFks.map(_._2).sortBy(_.childCols.mkString(","))
        DbTable(sch, tab, cols.toSeq, fks)
      }
    } finally conn.close()
  }

  import java.sql.Types._

  /** Type-correct generators per column. Unique integer keys ride the
    * generator's internal row index (`__index_inc`, available to computed
    * fields) — contiguous, unique, partitioning-invariant; a unique
    * SMALLINT/TINYINT key past its type range fails LOUDLY at generation
    * time (ANSI cast overflow) rather than wrapping into duplicate keys.
    * Unique strings become sequential values sized to fit the column.
    * Unknown column types throw with the supported list (silently
    * generating random strings for a UDT would be data that looks right
    * and is wrong).
    */
  def fieldDefs(t: DbTable): Seq[FieldDef] = t.columns.map { c =>
    def alphaNum(minLen: Int, maxLen: Int) =
      FieldDef(c.name, "alphanum", minLen = Some(minLen), maxLen = Some(maxLen))
    c.jdbcType match {
      case INTEGER | SMALLINT | TINYINT | BIGINT if c.isUnique =>
        val sqlType = if (c.jdbcType == BIGINT) "bigint"
          else if (c.jdbcType == SMALLINT) "smallint" else "int"
        FieldDef(c.name, "sql", sql = Some(s"cast(__index_inc as $sqlType)"))
      case INTEGER => FieldDef(c.name, "int", lo = Some(0.0), hi = Some(1000000.0))
      case BIGINT => FieldDef(c.name, "int", lo = Some(0.0), hi = Some(1e12))
      case SMALLINT => FieldDef(c.name, "int", lo = Some(0.0), hi = Some(32767.0))
      case TINYINT => FieldDef(c.name, "int", lo = Some(0.0), hi = Some(127.0))
      case DOUBLE | FLOAT | REAL => FieldDef(c.name, "double", lo = Some(0.0), hi = Some(1000.0))
      case DECIMAL | NUMERIC =>
        // stay inside precision-scale digits so DB inserts never overflow:
        // max = 10^(p-s) - 2*10^(-s) leaves headroom for the database
        // rounding a generated double UP at scale s (DECIMAL(5,5) gets
        // [0, ~0.99998], not [0, 9] — p-s can be zero)
        val intDigits = math.min(math.max(c.size - math.max(c.scale, 0), 0), 9)
        val hi = math.pow(10, intDigits) - 2 * math.pow(10, -math.max(c.scale, 0))
        FieldDef(c.name, "double", lo = Some(0.0), hi = Some(math.max(hi, 0.0)))
      case CHAR if c.isUnique => FieldDef(c.name, "sequential",
        prefix = Some(""), pad = Some(math.max(1, math.min(c.size, 18))))
      case VARCHAR | LONGVARCHAR | CLOB if c.isUnique =>
        // total length (prefix + pad) must fit the column: VARCHAR(1)
        // gets a bare 1-digit sequence, not a 2-char prefix+digit
        val prefix = if (c.size >= 2 || c.size <= 0) c.name.take(1).toLowerCase else ""
        val room = if (c.size > 0) c.size - prefix.length else 18
        FieldDef(c.name, "sequential",
          prefix = Some(prefix), pad = Some(math.max(1, math.min(room, 18))))
      case CHAR =>
        val len = math.max(1, math.min(c.size, 30))
        alphaNum(len, len)
      case VARCHAR | LONGVARCHAR | CLOB =>
        val maxLen = math.max(1, math.min(if (c.size > 0) c.size else 20, 30))
        alphaNum(math.min(5, maxLen), maxLen)
      case DATE => FieldDef(c.name, "date")
      case TIMESTAMP | TIMESTAMP_WITH_TIMEZONE => FieldDef(c.name, "timestamp")
      case BOOLEAN | BIT => FieldDef(c.name, "boolean")
      case BINARY | VARBINARY | LONGVARBINARY | BLOB => FieldDef(c.name, "binary")
      case other => throw new IllegalArgumentException(
        s"${t.qualified}.${c.name}: unsupported JDBC type $other (${c.typeName}); " +
          "supported: int/bigint/smallint/tinyint/double/float/real/decimal/" +
          "char/varchar/clob/date/timestamp/boolean/binary")
    }
  }

  /** Constraint rules mined from the catalog: NOT NULL columns and
    * character lengths — evaluated in ONE projection by [[graft.rules.RuleEngine]].
    */
  def rules(t: DbTable): Seq[Rule] = t.columns.flatMap { c =>
    val notNull = if (!c.nullable) Seq(Rules.isNotNull(c.name)) else Nil
    val len = c.jdbcType match {
      case VARCHAR | LONGVARCHAR | CHAR | CLOB if c.size > 0 =>
        Seq(Rules.lengthBetween(c.name, 0, c.size))
      case _ => Nil
    }
    notNull ++ len
  }

  /** Whole-database plan: one generation task per table (insert order and
    * referential integrity come from the FK relationships — composite keys
    * included), `rowsPerTable` rows each unless overridden by name.
    */
  def toPlan(tables: Seq[DbTable], planName: String = "jdbc_import",
      rowsPerTable: Long = 1000L, counts: Map[String, Long] = Map.empty,
      seed: Long = 42L,
      /** Permit FKs whose parent wasn't discovered (deliberately filtered
        * schemas): those child columns fall back to random type-based
        * values — dangling keys, caller's explicit choice. */
      allowDanglingFks: Boolean = false): MultiPlanSpec = {
    val known = tables.map(_.name).toSet
    val tasks = tables.map(t =>
      TaskDef(t.name, counts.getOrElse(t.name, rowsPerTable), fieldDefs(t)))
    val dangling = tables.flatMap(t =>
      t.fks.filterNot(fk => known.contains(fk.parentTable))
        .map(fk => s"${t.name}.${fk.childCols.mkString(",")} -> ${fk.parentTable}"))
    require(dangling.isEmpty || allowDanglingFks,
      s"FKs reference undiscovered parent tables: ${dangling.mkString("; ")} — " +
        "widen the discovery filter, or pass allowDanglingFks=true to generate " +
        "those child columns unreferenced")
    val rels = tables.flatMap { t =>
      t.fks.filter(fk => known.contains(fk.parentTable)).map { fk =>
        RelationshipDef(
          s"${t.name}.${fk.childCols.mkString(",")}",
          s"${fk.parentTable}.${fk.parentCols.mkString(",")}")
      }
    }
    MultiPlanSpec(planName, seed, tasks, rels)
  }

  /** Value-stats refinement: when the table already holds rows, profile it
    * through Spark's JDBC relation (distributed read) and let the
    * [[graft.profiler.Profiler]] suggest tighter specs than the
    * catalog-type defaults (observed ranges, low-cardinality oneOf sets).
    */
  def profiledSpecs(spark: SparkSession, url: String, t: DbTable): Option[Seq[graft.generator.FieldSpec]] = {
    val df = Jdbc.read(spark, url, t.qualified)
    if (df.isEmpty) None
    else Some(graft.profiler.Profiler.suggestFieldSpecs(graft.profiler.Profiler.profile(df)))
  }
}
