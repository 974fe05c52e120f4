package graft.plan

/** The reference's `application.conf` deployment surface
  * (`core/config/ConfigParser.scala` over Typesafe Config): folders (plan/
  * task/validation paths, env-substitutable), feature flags, runtime Spark
  * config, and NAMED CONNECTIONS grouped by format (`jdbc { mysql { url =
  * ... } }`) that task summaries reference by `dataSourceName`. The sandbox
  * has no typesafe-config jar, so this is a from-scratch parser for the
  * HOCON SUBSET the reference's own confs use (`app/src/main/resources/
  * application.conf`, `example/docker/data/custom/application.conf`):
  *
  *  - nested blocks `key { ... }`, one directive per line
  *  - `key = value` — quoted strings, bare tokens, numbers, booleans,
  *    raw `[...]` arrays; a trailing comma is tolerated (the reference's
  *    runtime.config block ends every line with one)
  *  - quoted keys are LITERAL (`"spark.driver.memory"` is one segment);
  *    bare dotted keys are paths (`datastax-java-driver.advanced...`)
  *  - `${?ENV}` optional substitution: the assignment applies only when
  *    the variable is set (HOCON last-wins gives the env-override idiom);
  *    `${ENV}` is mandatory and fails loudly when missing
  *  - `#` and `//` comments, blank lines
  */
object AppConfig {

  /** Reference `SUPPORTED_CONNECTION_FORMATS` (`core/model/Constants
    * .scala:31`) plus the jdbc-mapped database types (`ConfigParser
    * .scala:60-64`: postgres/mysql become format=jdbc + default driver). */
  private val connectionFormats =
    Seq("csv", "json", "orc", "parquet", "cassandra", "jdbc", "http", "jms", "kafka")
  private val jdbcMapped = Map(
    "postgres" -> "org.postgresql.Driver",
    "mysql" -> "com.mysql.cj.jdbc.Driver")

  final case class Conf(entries: Map[Vector[String], String], blocks: Set[Vector[String]]) {
    def get(path: String*): Option[String] = entries.get(path.toVector)

    /** All entries under `prefix`, remaining segments joined with '.' —
      * the reference flattens with `entrySet()` the same way
      * (`ConfigParser.scala:73-76`), so `kafka.bootstrap.servers` inside a
      * connection block survives as one dotted option key. */
    def section(prefix: String*): Map[String, String] = {
      val p = prefix.toVector
      entries.collect {
        case (k, v) if k.length > p.length && k.startsWith(p) =>
          k.drop(p.length).mkString(".") -> v
      }
    }

    /** Names one level below `prefix`: entry paths AND declared (possibly
      * EMPTY) blocks — the reference registers an empty `csv { csv { } }`
      * connection too (any OBJECT value, `ConfigParser.scala:70-78`). */
    def subsections(prefix: String*): Seq[String] = {
      val p = prefix.toVector
      val fromEntries = entries.keys.collect {
        case k if k.length > p.length + 1 && k.startsWith(p) => k(p.length)
      }
      val fromBlocks = blocks.collect {
        case b if b.length == p.length + 1 && b.startsWith(p) => b.last
      }
      (fromEntries ++ fromBlocks).toSeq.distinct.sorted
    }

    def flags: Map[String, Boolean] =
      section("flags").map { case (k, v) => k -> v.equalsIgnoreCase("true") }
    def folders: Map[String, String] = section("folders")
    def master: Option[String] = get("runtime", "master")
    def runtimeConfig: Map[String, String] = section("runtime", "config")

    /** Named connections: name → options incl. `format` (the reference's
      * `connectionConfigsByName`). */
    def connections: Map[String, Map[String, String]] = {
      val standard = connectionFormats.flatMap { fmt =>
        subsections(fmt).map(name => name -> (section(fmt, name) + ("format" -> fmt)))
      }
      val mapped = jdbcMapped.keys.toSeq.sorted.flatMap { typ =>
        subsections(typ).map { name =>
          val base = section(typ, name)
          val withDriver =
            if (base.contains("driver")) base else base + ("driver" -> jdbcMapped(typ))
          name -> (withDriver + ("format" -> "jdbc"))
        }
      }
      (standard ++ mapped).toMap
    }
  }

  def parse(text: String, env: String => Option[String] = sys.env.get): Conf = {
    val entries = scala.collection.mutable.LinkedHashMap[Vector[String], String]()
    val blocks = scala.collection.mutable.Set[Vector[String]]()
    var path = Vector.empty[String]
    // a dotted block key (`a.b { ... }`) pushes several segments at once;
    // '}' must pop the same number
    var pushSizes = List.empty[Int]

    def stripComment(line: String): String = {
      var inQ = false; var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (c == '"') inQ = !inQ
        else if (!inQ && (c == '#' || (c == '/' && i + 1 < line.length && line.charAt(i + 1) == '/')))
          return line.substring(0, i)
        i += 1
      }
      line
    }

    def keySegments(raw: String): Vector[String] = {
      val k = raw.trim
      if (k.startsWith("\"") && k.endsWith("\"") && k.length >= 2)
        Vector(k.substring(1, k.length - 1))
      else k.split('.').toVector
    }

    def resolveValue(raw0: String): Option[String] = {
      val raw = raw0.trim.stripSuffix(",").trim
      val opt = "^\\$\\{\\?([A-Za-z0-9_.]+)\\}$".r
      val mand = "^\\$\\{([A-Za-z0-9_.]+)\\}$".r
      raw match {
        case opt(name) => env(name) // unset → keep the previous assignment
        case mand(name) => Some(env(name).getOrElse(throw new IllegalArgumentException(
          s"application.conf: mandatory substitution $${$name} has no value")))
        case q if q.startsWith("\"") && q.endsWith("\"") && q.length >= 2 =>
          Some(q.substring(1, q.length - 1))
        case other => Some(other)
      }
    }

    text.linesIterator.map(stripComment).map(_.trim).filter(_.nonEmpty).foreach { line =>
      if (line == "}") {
        require(pushSizes.nonEmpty, "application.conf: unbalanced '}'")
        path = path.dropRight(pushSizes.head)
        pushSizes = pushSizes.tail
      } else if (line.endsWith("{") && !line.contains("=")) {
        val segs = keySegments(line.dropRight(1))
        path = path ++ segs
        pushSizes = segs.length :: pushSizes
        blocks += path
      } else {
        val eq = {
          // first '=' outside quotes
          var inQ = false; var i = 0; var found = -1
          while (i < line.length && found < 0) {
            val c = line.charAt(i)
            if (c == '"') inQ = !inQ else if (!inQ && c == '=') found = i
            i += 1
          }
          found
        }
        require(eq > 0, s"application.conf: cannot parse line '$line'")
        val key = path ++ keySegments(line.substring(0, eq))
        resolveValue(line.substring(eq + 1)).foreach(v => entries(key) = v)
      }
    }
    require(path.isEmpty, "application.conf: unclosed block(s) " + path.mkString("."))
    Conf(entries.toMap, blocks.toSet)
  }
}
