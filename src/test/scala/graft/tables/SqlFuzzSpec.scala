package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Property-style fuzz of the [[GraftSql]] statement grammar (the
  * engine's hand-parsed SQL funnel — MERGE clause grammar aside, every
  * statement family is a regex + handler pair, so the grammar's claimed
  * degrees of freedom need pinning the way the crash matrix pins the
  * slice protocol).
  *
  * Protocol: a SEEDED generator drives 1,100+ statement executions
  * through TWO warehouses bootstrapped identically — warehouse A runs
  * each statement in canonical form, warehouse B runs the SAME
  * statement MANGLED along exactly the axes the grammar declares free:
  * keyword case (every pattern is `(?is)`), whitespace runs (`\s+` /
  * `\s*`), leading whitespace, and the optional trailing semicolon.
  * String literals and backticked names are never touched (they are
  * data). The fixpoint property: read-only statements must return the
  * same stable-projected rows on both sides AS THEY RUN, and at the end
  * the two warehouses must be INDISTINGUISHABLE — same table set,
  * schemas, row sets, history action sequences, tags, table/column
  * comments, constraints, properties, and grants. A regex that
  * mis-parses a mangled form — matching the wrong family, capturing the
  * wrong group, or silently falling through to `spark.sql` — diverges
  * observable state and fails here with the offending statement named.
  *
  * Error paths: a barrage of malformed statements (one per major
  * family) must each refuse LOUDLY — a non-trivial, actionable message,
  * per the engine's stated fail-loud contract — and must commit
  * NOTHING (history lengths unchanged across the barrage). */
class SqlFuzzSpec extends SparkSpec {

  private val Seed = 20260816L
  private val NPairs = 560 // canonical + mangled = 1,120 executions

  // ------------------------------------------------------------ mangler
  /** Randomize what the grammar says doesn't matter; preserve what it
    * says does. Canonical statements write keywords UPPERCASE and
    * identifiers lowercase, so flipping only uppercase letters outside
    * quoted/backticked regions mangles every keyword and no name. */
  private def mangle(stmt: String, rng: scala.util.Random): String = {
    val sb = new StringBuilder
    var inQ = false; var inT = false
    var i = 0
    while (i < stmt.length) {
      val c = stmt.charAt(i)
      if (inQ) { sb += c; if (c == '\'') inQ = false }
      else if (inT) { sb += c; if (c == '`') inT = false }
      else c match {
        case '\'' => inQ = true; sb += c
        case '`'  => inT = true; sb += c
        case ' ' => sb ++= (rng.nextInt(5) match {
          case 0 => " "
          case 1 => "  "
          case 2 => "\t"
          case 3 => " \n "
          case _ => "   "
        })
        case u if u.isUpper =>
          sb += (if (rng.nextBoolean()) u.toLower else u)
        case o => sb += o
      }
      i += 1
    }
    val body = sb.toString
    val led = if (rng.nextBoolean()) "  \n" + body else body
    rng.nextInt(3) match {
      case 0 => led + ";"
      case 1 => led + " ;"
      case _ => led
    }
  }

  // ------------------------------------------------- stable projections
  /** Rows as sorted strings with the warehouse root scrubbed (paths are
    * the ONE legitimate difference between the twins). */
  private def rowsOf(df: DataFrame, root: String): Seq[String] =
    df.collect().map(_.toString.replace(root, "<WH>")).toSeq.sorted

  /** A read-only statement's comparison: label + projection. `None`
    * projection = compare row COUNT only (outputs that name files or
    * carry wall-clock ages can't compare row-for-row). */
  private type Cmp = (String, Option[DataFrame => DataFrame])
  private val Full: Option[DataFrame => DataFrame] = Some(identity)
  private val CountOnly: Option[DataFrame => DataFrame] = None

  // ------------------------------------------------------ the generator
  /** One seeded statement: text, plus Some(cmp) when read-only. The
    * generator tracks just enough model state (existing extra columns,
    * tags, constraints, transient tables) to only emit VALID statements
    * — invalidity is the error-path barrage's job, not random drift. */
  private final class Gen(rng: scala.util.Random) {
    private var n = 0
    private def id(): Int = { n += 1; n }
    // name -> current type (widening is only generated when lossless)
    private val addedCols =
      scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    private val tags = scala.collection.mutable.ArrayBuffer.empty[String]
    private val cks = scala.collection.mutable.ArrayBuffer.empty[String]
    private val props = scala.collection.mutable.ArrayBuffer.empty[String]
    private val mvs = scala.collection.mutable.ArrayBuffer.empty[String]
    private def t(): String = if (rng.nextBoolean()) "silver.fz1" else "silver.fz2"

    /** next batch of statements (usually one; transient-table scripts
      * emit a short sequence) with optional read-compare. */
    def next(): Seq[(String, Option[Cmp])] = rng.nextInt(25) match {
      case 0 | 1 | 2 => // named-column insert (schema-growth-proof)
        val a = rng.nextInt(1000); val b = rng.nextInt(1000)
        Seq((s"INSERT INTO ${t()} (k, v) VALUES ($a, 'a$a'), ($b, 'b$b')",
          None))
      case 3 => // update
        Seq((s"UPDATE ${t()} SET v = concat(v, '!') WHERE k % 7 = ${rng.nextInt(7)}",
          None))
      case 4 => // bounded delete
        Seq((s"DELETE FROM ${t()} WHERE k > ${900 + rng.nextInt(90)}", None))
      case 5 => // table/column comment, quote-escape and NULL unset forms
        val tn = t()
        if (rng.nextBoolean())
          Seq((s"COMMENT ON TABLE $tn IS " +
            (if (rng.nextInt(4) == 0) "NULL" else s"'it''s #${id()}'"), None))
        else
          Seq((s"COMMENT ON COLUMN $tn.v IS " +
            (if (rng.nextInt(4) == 0) "NULL" else s"'col #${id()}'"), None))
      case 6 => // tag lifecycle
        if (tags.nonEmpty && rng.nextBoolean()) {
          val tag = tags.remove(rng.nextInt(tags.length))
          Seq((s"ALTER TABLE silver.fz1 DROP TAG $tag", None))
        } else {
          val tag = s"tag_${id()}"
          tags += tag
          Seq((s"ALTER TABLE silver.fz1 CREATE TAG $tag" +
            (if (rng.nextBoolean()) " AS OF VERSION 0" else ""), None))
        }
      case 7 => // CHECK constraint lifecycle (never violated: k >= 0)
        if (cks.nonEmpty && rng.nextBoolean()) {
          val ck = cks.remove(rng.nextInt(cks.length))
          Seq((s"ALTER TABLE silver.fz1 DROP CONSTRAINT $ck", None))
        } else {
          val ck = s"ck_${id()}"
          cks += ck
          Seq((s"ALTER TABLE silver.fz1 ADD CONSTRAINT $ck " +
            s"CHECK (k > -${1 + rng.nextInt(50)})", None))
        }
      case 8 => // added-column lifecycle: add → default → widen/rename → drop
        if (addedCols.nonEmpty && rng.nextBoolean()) {
          val (c, ty) = addedCols.remove(rng.nextInt(addedCols.length))
          rng.nextInt(3) match {
            case 0 => Seq((s"ALTER TABLE silver.fz2 DROP COLUMN $c", None))
            case 1 =>
              val r = c + "r"
              addedCols += ((r, ty))
              Seq((s"ALTER TABLE silver.fz2 RENAME COLUMN $c TO $r", None))
            case _ if ty == "int" => // lossless widen, once per column
              addedCols += ((c, "bigint"))
              Seq((s"ALTER TABLE silver.fz2 ALTER COLUMN $c TYPE bigint",
                None))
            case _ =>
              addedCols += ((c, ty))
              Seq((s"COMMENT ON COLUMN silver.fz2.$c IS 'wide${id()}'",
                None))
          }
        } else {
          val c = s"c${id()}"
          addedCols += ((c, "int"))
          Seq((s"ALTER TABLE silver.fz2 ADD COLUMNS ($c INT)", None),
            (s"ALTER TABLE silver.fz2 ALTER COLUMN $c SET DEFAULT ${rng.nextInt(9)}",
              None))
        }
      case 9 => // TBLPROPERTIES lifecycle
        if (props.nonEmpty && rng.nextBoolean()) {
          val p = props.remove(rng.nextInt(props.length))
          Seq((s"ALTER TABLE silver.fz1 UNSET TBLPROPERTIES IF EXISTS ('$p')",
            None))
        } else {
          val p = s"fz.p${id()}"
          props += p
          Seq((s"ALTER TABLE silver.fz1 SET TBLPROPERTIES ('$p' = 'v${id()}')",
            None))
        }
      case 10 => // maintenance
        if (rng.nextInt(3) == 0)
          Seq((s"OPTIMIZE ${t()} ZORDER BY (k)", None))
        else Seq((s"OPTIMIZE ${t()}", None))
      case 11 => // vacuum previews (read-only; outputs name files → count)
        val retain = 1 + rng.nextInt(3)
        val detail = if (rng.nextBoolean()) " DETAIL" else ""
        Seq((s"VACUUM ${t()} RETAIN $retain VERSIONS DRY RUN$detail",
          Some(("vacuum_dry", CountOnly))))
      case 12 =>
        Seq((s"DESCRIBE TABLE ${t()}", Some(("desc", Full))))
      case 13 =>
        Seq((s"SHOW COLUMNS IN ${t()}", Some(("cols", Full))))
      case 14 => // history: version+action (timestamps are wall-clock)
        Seq((s"DESCRIBE HISTORY ${t()}",
          Some(("hist", Some((d: DataFrame) => d.select("version", "action"))))))
      case 15 =>
        Seq(("SHOW TABLES", Some(("tables", Full))))
      case 16 =>
        Seq((s"SHOW TAGS silver.fz1", Some(("tags", Full))))
      case 17 =>
        Seq((s"SHOW TBLPROPERTIES silver.fz1",
          // engine-managed props may carry paths/timestamps; the fuzz
          // compares its own namespace
          Some(("props", Some((d: DataFrame) =>
            d.filter(org.apache.spark.sql.functions.col("key")
              .startsWith("fz.")))))))
      case 18 => // grants lifecycle + readback
        val u = s"user${rng.nextInt(5)}"
        rng.nextInt(3) match {
          case 0 => Seq((s"GRANT SELECT, MODIFY ON TABLE silver.fz1 TO `$u`",
            None))
          case 1 => Seq((s"REVOKE SELECT ON TABLE silver.fz1 FROM `$u`",
            None))
          case _ => Seq(("SHOW GRANTS ON TABLE silver.fz1",
            Some(("grants", Full))))
        }
      case 19 => // transient table script: create → insert → truncate →
        // drop → undrop → drop (UNDROP restores the newest drop on both
        // sides deterministically)
        val tn = s"silver.tr${id()}"
        val parted = rng.nextBoolean()
        val create =
          if (parted) s"CREATE TABLE $tn (a INT, p STRING) PARTITIONED BY (p)"
          else s"CREATE TABLE $tn (a INT, p STRING) TBLPROPERTIES ('o'='1')"
        Seq(
          (create, None),
          (s"INSERT INTO $tn (a, p) VALUES (1, 'x'), (2, 'y')", None),
          (s"TRUNCATE TABLE $tn", None),
          (s"DROP TABLE $tn", None),
          (s"UNDROP TABLE $tn", None),
          (s"DROP TABLE IF EXISTS $tn", None))
      case 20 => // CTAS + shallow clone, then drop both
        val a = s"silver.ct${id()}"; val b = s"silver.cl${id()}"
        Seq(
          (s"CREATE OR REPLACE TABLE $a AS SELECT ${rng.nextInt(9)} AS x, 'c' AS y",
            None),
          (s"CREATE TABLE $b SHALLOW CLONE $a", None),
          (s"DROP TABLE $b", None),
          (s"DROP TABLE $a", None))
      case 21 => // merge twins (frozen schema)
        val a = rng.nextInt(1000)
        Seq(
          (s"INSERT INTO silver.m2 (k, v) VALUES ($a, 'm$a')", None),
          (if (rng.nextBoolean())
            "MERGE INTO silver.m1 AS t USING silver.m2 AS s ON t.k = s.k " +
              "WHEN MATCHED THEN UPDATE SET * " +
              "WHEN NOT MATCHED THEN INSERT *"
          else
            "MERGE INTO silver.m1 AS t USING silver.m2 AS s ON t.k = s.k " +
              "WHEN NOT MATCHED THEN INSERT *", None))
      case 22 => // partitioned REPLACE WHERE + stats + partition listing
        rng.nextInt(3) match {
          case 0 =>
            val part = if (rng.nextBoolean()) "pa" else "pb"
            val a = rng.nextInt(100)
            Seq((s"INSERT INTO silver.pt REPLACE WHERE p = '$part' " +
              s"VALUES ($a, '$part'), (${a + 1}, '$part')", None))
          case 1 => Seq((s"ANALYZE TABLE silver.pt COMPUTE STATISTICS " +
            "FOR ALL COLUMNS", None))
          case _ => Seq(("SHOW PARTITIONS silver.pt", Some(("parts", Full))))
        }
      case 23 => // materialized-view lifecycle over a frozen-schema base
        // (the grammar-richest CREATE form: select list, optional
        // filter, GROUP BY — plus REFRESH's mode machinery and the
        // SHOW relation, all deterministic across the twins)
        if (mvs.nonEmpty && rng.nextInt(4) == 0) {
          val m = mvs.remove(rng.nextInt(mvs.length))
          Seq((s"DROP TABLE $m", None))
        } else if (mvs.nonEmpty && rng.nextBoolean()) {
          val m = mvs(rng.nextInt(mvs.length))
          val a = rng.nextInt(500)
          Seq(
            (s"INSERT INTO silver.mvb (k, v, g) VALUES " +
              s"($a, 'x$a', 'g${a % 5}'), (${a + 7}, 'y$a', 'g${a % 3}')",
              None),
            (s"REFRESH MATERIALIZED VIEW $m", None),
            ("SHOW MATERIALIZED VIEWS", Some(("mv_list", Full))))
        } else {
          val m = s"silver.mvf${id()}"
          mvs += m
          val filt = if (rng.nextBoolean()) " WHERE k > 5" else ""
          Seq((s"CREATE OR REPLACE MATERIALIZED VIEW $m AS " +
            s"SELECT g, SUM(k) AS s, COUNT(*) AS c " +
            s"FROM silver.mvb$filt GROUP BY g", None))
        }
      case _ => // misc read surface
        rng.nextInt(4) match {
          case 0 => Seq((s"FSCK REPAIR TABLE ${t()} DRY RUN",
            Some(("fsck", CountOnly))))
          case 1 => Seq(("SHOW PINS silver.fz1", Some(("pins", Full))))
          case 2 => Seq(("SHOW MATERIALIZED VIEWS", Some(("mvs", Full))))
          case _ => Seq((s"SHOW CREATE TABLE silver.fz1",
            Some(("create", Full))))
        }
    }
  }

  // ------------------------------------------------------------- driver
  private def bootstrap(): (Catalog, GraftSql, String) = {
    val root = tmpDir("graft-fuzz-")
    val cat = new Catalog(spark, root)
    cat.bootstrap()
    val g = GraftSql(spark, cat)
    Seq(
      "CREATE TABLE silver.fz1 (k BIGINT, v STRING)",
      "CREATE TABLE silver.fz2 (k BIGINT, v STRING)",
      "CREATE TABLE silver.m1 (k BIGINT, v STRING)",
      "CREATE TABLE silver.m2 (k BIGINT, v STRING)",
      "CREATE TABLE silver.pt (k BIGINT, p STRING) PARTITIONED BY (p)",
      "CREATE TABLE silver.mvb (k BIGINT, v STRING, g STRING)",
      "INSERT INTO silver.mvb (k, v, g) VALUES (1, 'a', 'g0'), " +
        "(2, 'b', 'g1'), (9, 'c', 'g0')",
      "INSERT INTO silver.fz1 (k, v) VALUES (1, 'one'), (2, 'two')",
      "INSERT INTO silver.fz2 (k, v) VALUES (3, 'three')",
      "INSERT INTO silver.m1 (k, v) VALUES (10, 'ten')",
      "INSERT INTO silver.pt VALUES (1, 'pa'), (2, 'pb')"
    ).foreach(g.sql(_))
    (cat, g, root)
  }

  /** Full observable state of a warehouse, root-scrubbed: per table —
    * schema, sorted rows, history action sequence, tags, fz-props,
    * comments; plus the grants ledger. */
  private def stateOf(cat: Catalog, g: GraftSql, root: String): Seq[String] = {
    val perTable = cat.tables.sorted.flatMap { case (layer, name) =>
      val t = cat.table(layer, name)
      Seq(
        s"table:$layer.$name",
        s"schema:$layer.$name:${t.read.schema.map(f =>
          s"${f.name}:${f.dataType.simpleString}").mkString(",")}",
        s"rows:$layer.$name:${rowsOf(t.read, root).mkString("|")}",
        s"hist:$layer.$name:${t.history.map(e =>
          s"${e.version}=${e.action}").mkString(",")}",
        s"tags:$layer.$name:${t.tags.toSeq.sorted.mkString(",")}",
        // constraint NAMES (exprs may differ by collapsed whitespace —
        // the semantics, not the spelling, is the fixpoint)
        s"cks:$layer.$name:${t.checks.map(_._1).sorted.mkString(",")}")
    }
    perTable ++ rowsOf(g.sql("SHOW GRANTS"), root).map("grant:" + _)
  }

  test(s"grammar fixpoint: ${NPairs}+ seeded statements run canonical " +
       "vs case/whitespace-mangled against twin warehouses; every " +
       "read-only result matches in flight and the final states are " +
       "indistinguishable") {
    val (catA, gA, rootA) = bootstrap()
    val (catB, gB, rootB) = bootstrap()
    val genRng = new scala.util.Random(Seed)
    val mangleRng = new scala.util.Random(Seed + 1)
    val gen = new Gen(genRng)
    var executedPairs = 0
    while (executedPairs < NPairs) {
      gen.next().foreach { case (stmt, cmp) =>
        val mangled = mangle(stmt, mangleRng)
        val ra =
          try gA.sql(stmt)
          catch { case e: Throwable =>
            fail(s"canonical statement failed: <$stmt>: $e") }
        val rb =
          try gB.sql(mangled)
          catch { case e: Throwable =>
            fail(s"mangled form failed: <$mangled> (canonical <$stmt>): $e") }
        cmp.foreach { case (label, proj) =>
          proj match {
            case Some(p) =>
              assert(rowsOf(p(ra), rootA) === rowsOf(p(rb), rootB),
                s"$label: <$stmt> vs mangled <$mangled> diverged")
            case None =>
              assert(ra.count() === rb.count(),
                s"$label: <$stmt> vs mangled <$mangled> count diverged")
          }
        }
        executedPairs += 1
      }
    }
    assert(executedPairs >= NPairs)
    assert(stateOf(catA, gA, rootA) === stateOf(catB, gB, rootB),
      "twin warehouses diverged after the full seeded stream")
    // the property held over >= 2 * NPairs statement executions
    assert(2 * executedPairs >= 1100, s"only ${2 * executedPairs} executions")
  }

  test("script splitting fixpoint: a seeded multi-statement script with " +
       "hostile literals (semicolons, comment markers, quotes in " +
       "comments) executes identically to its statements run one-by-one") {
    val (catA, gA, rootA) = bootstrap()
    val (catB, gB, rootB) = bootstrap()
    val rng = new scala.util.Random(Seed + 7)
    val gen = new Gen(rng)
    // the splitter's adversaries, planted explicitly: separators and
    // comment markers INSIDE literals/backticks are data; apostrophes
    // INSIDE comments must not open string state
    val hostile = Seq(
      "COMMENT ON TABLE silver.fz1 IS 'semi;colon -- not a comment'",
      "INSERT INTO silver.fz1 (k, v) VALUES (7077, 'a;b--c'), (7078, 'd\"e')",
      "UPDATE silver.fz1 SET v = concat(v, ';') WHERE k = 7077",
      "ALTER TABLE silver.fz1 ADD CONSTRAINT ck_script " +
        "CHECK (k > -5 OR v != 'x;y')",
      "GRANT SELECT ON TABLE silver.fz1 TO `weird.group-name`",
      "COMMENT ON COLUMN silver.fz1.v IS 'don''t; stop -- here'")
    val generated = Seq.fill(12)(gen.next()).flatten.map(_._1)
    // SHOW TABLES last: sqlScript returns the LAST statement's result
    val stmts = (hostile ++ generated) :+ "SHOW TABLES"
    val script = stmts.map { s =>
      val lead = rng.nextInt(3) match {
        case 0 => s"-- comment; with 'quotes\" and -- markers\n"
        case 1 => "\n  \n"
        case _ => ""
      }
      lead + s + (if (rng.nextBoolean()) " -- trailing; 'note" else "")
    }.mkString("\n;\n")
    val scriptResult = gA.sqlScript(script)
    val oneByOne = stmts.map(gB.sql(_)).last
    assert(rowsOf(scriptResult, rootA) === rowsOf(oneByOne, rootB),
      "sqlScript must return the LAST statement's result")
    assert(stateOf(catA, gA, rootA) === stateOf(catB, gB, rootB),
      "script execution diverged from statement-by-statement execution")
    // and the hostile literal content survived splitting intact
    import org.apache.spark.sql.functions.col
    val v = catA.table("silver", "fz1").read
      .filter(col("k") === 7077).select("v").collect().map(_.getString(0))
    assert(v.length === 1 && v.head == "a;b--c;",
      s"literal with separators mangled: ${v.toSeq}")
  }

  test("error paths refuse loudly and commit nothing: one malformed " +
       "statement per major family") {
    val (cat, g, _) = bootstrap()
    val histBefore = cat.tables.sorted.map { case (l, n) =>
      cat.table(l, n).history.length }
    val malformed = Seq(
      "VACUUM silver.fz1 FORCE EXPIRE PINS",                // no age bound
      "VACUUM silver.fz1 FORCE EXPIRE PINS OLDER THAN 5 MINUTES", // floor
      "RESTORE TABLE silver.fz1 TO VERSION AS OF 999999",   // no version
      "UNDROP TABLE silver.never_was",                      // nothing to undrop
      "ALTER TABLE silver.fz1 ALTER COLUMN v TYPE int",     // narrowing
      "ALTER TABLE silver.fz1 DROP COLUMN nope",            // unknown column
      "ALTER TABLE silver.fz1 RENAME COLUMN nope TO x",     // unknown column
      "ALTER TABLE silver.fz1 DROP CONSTRAINT never_added", // unknown name
      "ALTER TABLE silver.fz1 DROP TAG never_tagged",       // unknown tag
      "COPY INTO silver.fz1 FROM '/no/such/dir' FILEFORMAT = XML", // format
      "INSERT INTO silver.fz1 (k, nope) VALUES (1, 'x')",   // unknown column
      "ALTER TABLE silver.fz1 ADD CONSTRAINT bad CHECK (k <> )", // bad expr
      "CREATE TABLE silver.bad SHALLOW CLONE silver.never_was",  // no source
      // principals are keyword-shaped by design (plain-TSV ledger);
      // an arbitrary quoted principal must refuse NAMING the contract,
      // not fall through to Spark's opaque INVALID_STATEMENT
      "GRANT SELECT ON TABLE silver.fz1 TO `weird;user--name`",
      "REVOKE SELECT ON TABLE silver.fz1 FROM `has space`"
    )
    val silent = malformed.flatMap { stmt =>
      try { g.sql(stmt); Some(s"<$stmt> silently succeeded") }
      catch { case e: Throwable =>
        val msg = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
        if (msg.trim.length > 15) None
        else Some(s"<$stmt> refused without an actionable message: $msg")
      }
    }
    assert(silent.isEmpty, silent.mkString("\n"))
    val histAfter = cat.tables.sorted.map { case (l, n) =>
      cat.table(l, n).history.length }
    assert(histAfter === histBefore,
      "a refused statement must never commit a version")
  }
}
