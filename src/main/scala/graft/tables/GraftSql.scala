package graft.tables

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, when}
import org.apache.spark.sql.types.StructType

/** The SQL maintenance surface (docs/backlog.md:103-106, the reference's
  * empty notebooks/05_ops/61_optimize_and_maintenance.sql): parsed
  * `OPTIMIZE` / `VACUUM` statements alongside the existing
  * `DESCRIBE HISTORY` / `DESCRIBE DETAIL` relation flows, completing the
  * table lifecycle — DDL, DML, time travel, CDC, and now maintenance —
  * in one SQL entry point. Anything that is not a graft maintenance
  * statement delegates verbatim to `spark.sql`, so callers can use one
  * `GraftSql.sql(...)` funnel for their whole session (the same
  * parse-what-you-own / delegate-the-rest shape as Delta's SQL parser).
  *
  * Grammar (case-insensitive; `<table>` is `layer.table`,
  * `layer_table`, or an explicit path ``graft.`/abs/path` ``):
  *
  *   OPTIMIZE <table>                          -- bin-pack small file-sets
  *   OPTIMIZE <table> ZORDER BY (c1, c2, ...)  -- multi-column clustering
  *   OPTIMIZE <table> WHERE k = 'v' [AND ...]  -- one partition's cells only
  *   VACUUM <table> [RETAIN n VERSIONS] [IGNORE PINS] [DRY RUN [DETAIL]]
  *   VACUUM <table> [RETAIN n VERSIONS] FORCE EXPIRE PINS
  *     OLDER THAN <n> MINUTES|HOURS|DAYS   -- drop dead-consumer pins, audited
  *     -- bound must be >= 1 HOUR: pin age is measured against the
  *        CONSUMER's clock (60s liveness heartbeats), so sub-hour
  *        bounds could expire live consumers on clock-skewed hosts
  *     -- DETAIL previews the FULL blast radius with per-path status
  *        (reclaimable vs pin-held) naming the blocking consumer pin,
  *        its floor version, and its last-advanced age
  *   SHOW PINS [<table>]                      -- consumer retention floors
  *     -- without a table: every pin of every catalog table, with how
  *        far behind the head it sits and its last-advanced age (the
  *        warehouse-wide what-blocks-reclamation view)
  *   EXPLAIN REWRITE <query>                  -- MV routing decision + why
  *   ALTER TABLE <table> DROP PIN '<name>'    -- release an abandoned consumer
  *   FSCK REPAIR TABLE <table> [DRY RUN]      -- drop refs to lost files
  *   RESTORE TABLE <table> TO VERSION AS OF n
  *   RESTORE TABLE <table> TO TIMESTAMP AS OF 'yyyy-MM-dd HH:mm:ss'
  *   RESTORE TABLE <table> TO TAG '<name>'
  *   CREATE TABLE <table> SHALLOW CLONE <table>
  *   ALTER TABLE <table> CREATE TAG <name> [AS OF VERSION n]  -- release pin
  *   ALTER TABLE <table> DROP TAG <name>    -- (tagged versions vacuum-exempt)
  *   SHOW TAGS <table>
  *   SELECT ... FROM <table> VERSION AS OF '<tag>' ...
  *   CREATE [OR REPLACE] MATERIALIZED VIEW <table> AS
  *     SELECT g1, ..., sum|count|min|max(c) AS name, ... FROM <table>
  *     [WHERE <pred>] GROUP BY g1, ...        -- materialized + auto-routed
  *     -- (filtered MVs maintain incrementally too but are queried by
  *     --  name, never auto-routed)
  *   CREATE [OR REPLACE] MATERIALIZED VIEW <table> AS
  *     SELECT g1, ..., fn(c) AS name, ... FROM <fact> JOIN <dim>
  *     USING (k, ...) | ON <fact>.k = <dim>.k [AND ...]
  *     [WHERE <dim>.pred [AND ...]] GROUP BY g1, ...
  *     -- join form: routed + maintained from BOTH sides' change feeds;
  *     -- dim-side WHERE = per-dim row filter (SCD2 current-view MVs;
  *     -- filtered definitions are queried by name, never auto-routed)
  *   REFRESH MATERIALIZED VIEW <table>        -- incremental when possible
  *   SHOW MATERIALIZED VIEWS                  -- defs + coverage + freshness
  *   CREATE [OR REPLACE] VIEW <name> AS <query>  -- durable (_views ledger,
  *     re-registered on catalog open; TEMP views stay Spark-native)
  *   DROP VIEW [IF EXISTS] <name>             -- ledger names; others delegate
  *   SHOW VIEWS                               -- the durable-view ledger
  *   ALTER TABLE <t> SET ROW FILTER (<pred>)   -- read governance: rows
  *     trimmed per session (current_principal() binds at registration)
  *   ALTER TABLE <t> DROP ROW FILTER
  *   ALTER TABLE <t> ALTER COLUMN c SET MASK (<expr>)  -- masked reads
  *   ALTER TABLE <t> ALTER COLUMN c DROP MASK
  *   GRANT p1[, p2] ON TABLE|SCHEMA|CATALOG <obj> TO `principal`
  *   REVOKE p1[, p2] ON … FROM `principal`    -- durable _grants ledger
  *   SHOW GRANTS [ON <obj> | TO `principal`]  -- enforced at this funnel
  *     when spark.graft.principal is set (UC-style conjunctive check)
  *   CONVERT TO GRAFT parquet.`/path` AS <table>   -- zero-copy adoption
  *   ANALYZE TABLE <table> COMPUTE STATISTICS FOR COLUMNS c1, c2, ...
  *   DESCRIBE HISTORY <table>
  *   DESCRIBE DETAIL <table>
  *   SELECT ... FROM <table> VERSION AS OF n ...        -- inline rewrite
  *   SELECT ... FROM <table> TIMESTAMP AS OF 'ts' ...   -- inline rewrite
  *
  * DML (the reference smoke flow, 01_environment_smoke_test.py:74-93,
  * and the backlog's MERGE pattern, docs/backlog.md:49-51):
  *
  *   CREATE [OR REPLACE] TABLE <table> (col TYPE, ...) [USING x]
  *     [PARTITIONED BY (...)] [TBLPROPERTIES (...)]
  *   CREATE [OR REPLACE] TABLE <table> [PARTITIONED BY (...)] AS <query>
  *   INSERT INTO <table> <query>            -- positional, cast to schema
  *   INSERT INTO <table> (c1, c2, ...) <query>  -- named; unlisted → NULL
  *   INSERT OVERWRITE [TABLE] <table> <query>
  *   INSERT INTO <table> REPLACE WHERE <cond> <query>  -- Delta replaceWhere
  *   TRUNCATE TABLE <table>                 -- schema-preserving empty
  *   DESCRIBE [TABLE] <table>               -- columns + engine contracts
  *   COMMENT ON TABLE <t> IS '…'|NULL
  *   COMMENT ON COLUMN <t>.<c> IS '…'|NULL
  *   UPDATE <table> SET c = expr [, ...] [WHERE cond]
  *   DELETE FROM <table> [WHERE cond]
  *   MERGE INTO <table> [AS] t USING <src> [AS] s ON t.k = s.k [AND ...]
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  *     | WHEN NOT MATCHED THEN INSERT *     -- insert-if-absent
  *   COPY INTO <table> FROM '<dir>' FILEFORMAT = PARQUET|JSON|CSV
  *   ALTER TABLE <table> ADD COLUMNS (c TYPE, ...)   -- metadata-only
  *   ALTER TABLE <table> ALTER COLUMN <c> SET DEFAULT <expr> | DROP DEFAULT
  *   ALTER TABLE <table> ALTER COLUMN <c> SET NOT NULL | DROP NOT NULL
  *   ALTER TABLE <table> ALTER COLUMN <c> TYPE <t>   -- lossless widening
  *   ALTER TABLE <table> ADD CONSTRAINT <name> CHECK (<expr>)
  *   ALTER TABLE <t> ADD CONSTRAINT <n> PRIMARY KEY (cols) [NOT ENFORCED] [RELY]
  *   ALTER TABLE <t> ADD CONSTRAINT <n> FOREIGN KEY (cols)
  *     REFERENCES <t2> [(cols)] [NOT ENFORCED] [RELY]   -- informational keys
  *   ALTER TABLE <table> DROP CONSTRAINT <name>
  *   ALTER TABLE <table> RENAME TO <table>   -- one directory move
  *   SHOW COLUMNS IN <table>
  *   DROP TABLE [IF EXISTS] <table>          -- moves to the catalog trash
  *   UNDROP TABLE <table>                    -- restore the newest drop
  *
  * A DML identifier that is NOT a graft table (unknown layer, no catalog
  * bound) delegates to vanilla `spark.sql`, so Spark catalog tables and
  * temp views keep working through the same funnel. MERGE's source needs
  * an alias and is a graft table, a temp view, or a parenthesized
  * subquery (one that itself contains ` ON ` — e.g. an inner join —
  * must be registered as a temp view instead; the statement regex cannot
  * see paren nesting and the funnel refuses the mis-parse loudly).
  * DML results are the committed `(version, action)` — affected-row
  * counts would cost an extra full scan per statement at 100 TB; the
  * commit metadata lives in DESCRIBE HISTORY.
  *
  * Retention is VERSION-based, not hour-based: the engine's time travel
  * is a version log, so `RETAIN 3 VERSIONS` is the honest analog of
  * Delta's `RETAIN n HOURS` (which gates on timestamps the test clock
  * can't control deterministically anyway).
  *
  * Scale notes. Bare OPTIMIZE is [[VersionedTable.compactSmall]] —
  * O(small files), the only form that is routine maintenance at 100 TB —
  * except on merge-bucketed tables, whose unit of maintenance is the
  * (partition, bucket) cell: those run [[VersionedTable.compact]], which
  * rewrites per-cell and preserves copy-on-write merge routing. The
  * small-file threshold comes from `spark.graft.optimize.smallFileBytes`
  * (default 128 MiB). VACUUM without DRY RUN deletes exactly what the
  * preview lists and returns the reclaimed count.
  */
final class GraftSql(spark: SparkSession, catalog: Option[Catalog]) {

  import GraftSql._

  /** Multi-statement script: split on TOP-LEVEL semicolons (quote- and
    * paren-aware — a `;` inside a string literal or subquery is data),
    * run each statement through [[sql]] in order, return the LAST
    * result (the notebook-cell contract). Empty statements and
    * `--`-to-end-of-line comments are dropped. */
  def sqlScript(script: String): DataFrame = {
    val stmts = GraftSql.splitTop(stripLineComments(script), ';')
    require(stmts.nonEmpty, "sqlScript: no statements")
    stmts.map(sql).last
  }

  /** Remove `-- …` line comments OUTSIDE string literals (single or
    * double quoted) and backticks. */
  private def stripLineComments(s: String): String = {
    val out = new StringBuilder
    var inStr = false; var inTick = false; var inDq = false; var esc = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { out += c
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '\'') inStr = false
        i += 1 }
      else if (inTick) { out += c; if (c == '`') inTick = false; i += 1 }
      else if (inDq) { out += c
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inDq = false
        i += 1 }
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
      } else {
        if (c == '\'') inStr = true
        else if (c == '`') inTick = true
        else if (c == '"') inDq = true
        out += c; i += 1
      }
    }
    out.toString
  }

  /** One funnel: graft maintenance statements execute against the
    * resolved [[VersionedTable]]; everything else is `spark.sql`. */
  def sql(stmt: String): DataFrame = {
    checkGrants(stmt)
    dispatch(stmt)
  }

  private def dispatch(stmt: String): DataFrame = stmt match {
    case OptimizeWhereStmt(ident, preds) =>
      optimizePartition(resolve(ident), preds)
    case OptimizeStmt(ident, zcols) => optimize(resolve(ident), Option(zcols))
    case VacuumDetailStmt(ident, retain) =>
      vacuumDryRunDetail(resolve(ident),
        Option(retain).map(_.toInt).getOrElse(1))
    case VacuumExpireStmt(ident, retain, n, unit) =>
      vacuumExpirePins(resolve(ident),
        Option(retain).map(_.toInt).getOrElse(1), n.toLong, unit)
    case VacuumExpireBareStmt(_, _, _) =>
      sys.error("VACUUM … FORCE EXPIRE PINS requires OLDER THAN <n> " +
        "MINUTES|HOURS|DAYS — expiring a pin is destructive for its " +
        "consumer, so the statement must state an explicit age bound")
    case VacuumStmt(ident, retain, ignorePins, dry) =>
      vacuum(resolve(ident), Option(retain).map(_.toInt).getOrElse(1),
        dryRun = dry != null, respectPins = ignorePins == null)
    case FsckStmt(ident, dry) =>
      import spark.implicits._
      val (missing, entry) = resolve(ident).fsckRepair(dryRun = dry != null)
      missing.map(f => (f, entry.isDefined))
        .toDF("file", "removed_from_snapshot")
    case RestoreVersionStmt(ident, v) => restore(resolve(ident), _.restore(v.toLong))
    case RestoreTimestampStmt(ident, ts) =>
      restore(resolve(ident), _.restoreAsOf(parseTsUtc(ts)))
    case RestoreTagStmt(ident, tag) =>
      restore(resolve(ident), t => t.restore(t.tags.getOrElse(tag,
        sys.error(s"RESTORE TO TAG: no tag `$tag` on $ident"))))
    case CloneStmt(target, source) => clone(resolve(source), targetRoot(target))
    case GraftSql.CreateMvProbe() =>
      GraftSql.parseCreateMvJoin(stmt) match {
        case Some((orReplace, mvIdent, selectList, factIdent, joins,
            where, groupBy)) =>
          createJoinMaterializedView(mvIdent, orReplace, selectList,
            factIdent,
            joins.map { case (dimIdent, usingCols, onCond) =>
              (dimIdent, GraftSql.parseJoinKeys(usingCols, onCond,
                factIdent, dimIdent))
            },
            where, groupBy)
        case None =>
          val (orReplace, mvIdent, selectList, srcIdent, where, groupBy) =
            GraftSql.parseCreateMv(stmt).getOrElse(sys.error(
              "CREATE MATERIALIZED VIEW: unrecognized shape — expected " +
                "SELECT g1,…, sum|count|min|max|approx_count_distinct(c) " +
                "AS name,… FROM <table> [WHERE <pred>] GROUP BY g1,… — " +
                "or the join form FROM <fact> JOIN <dim> USING (k,…) | " +
                "ON f.k = d.k GROUP BY g1,…"))
          createMaterializedView(mvIdent, orReplace, selectList,
            srcIdent, where, groupBy)
      }
    case RefreshMvStmt(ident) =>
      // join-shaped definitions carry graft.mv.join.* properties and
      // maintain through [[graft.plans.JoinMv]]; everything else is the
      // single-table path
      val tbl = owned(ident)
      if (tbl.exists(_.properties.contains(graft.plans.JoinMv.FactProp))) {
        import spark.implicits._
        val mode = graft.plans.JoinMv.refresh(spark, tbl.get)
        Seq((ident, mode,
          tbl.get.properties(graft.plans.JoinMv.FactVersionProp).toLong))
          .toDF("mv", "mode", "source_version")
      } else refreshMaterializedView(ident)
    case CreateViewStmt(orReplace, name, query) if catalog.isDefined =>
      import spark.implicits._
      val cat = catalog.get
      require(orReplace != null || !cat.views.exists(_._1 == name),
        s"view $name already exists; use CREATE OR REPLACE VIEW")
      cat.createView(name, query)
      Seq((name, "create_view")).toDF("view", "op")
    case CreateViewQualifiedStmt(_, name, _) if catalog.isDefined =>
      // refuse loudly rather than silently delegating a durable-looking
      // CREATE VIEW to spark.sql, where it would land as a
      // session-catalog view that vanishes on the next open
      sys.error(s"CREATE VIEW: durable views are single-level names " +
        s"(got `$name`) — drop the qualifier, or use CREATE TEMP VIEW " +
        "for a session-only view")
    // a name NOT in the durable ledger falls through to spark.sql
    // below — ordinary temp/session views keep their pre-existing
    // DROP VIEW behavior
    case DropViewStmt(_, name)
        if catalog.exists(_.views.exists(_._1 == name)) =>
      import spark.implicits._
      catalog.get.dropView(name)
      Seq((name, "drop_view")).toDF("view", "op")
    case ShowViewsStmt() if catalog.isDefined =>
      import spark.implicits._
      catalog.get.views.toDF("view", "definition")
    case ShowMvsStmt() if catalog.isDefined =>
      import spark.implicits._
      // one ledger read per MV decides freshness: covered == the
      // source's current head means REFRESH would be a noop and routing
      // is (re-)armable
      catalog.get.tables.flatMap { case (l, t) =>
        val props = catalog.get.table(l, t).properties
        props.get(GraftSql.MvSourceProp).map { srcRoot =>
          val covered = props(GraftSql.MvVersionProp).toLong
          val src = VersionedTable(spark, srcRoot)
          (s"$l.$t",
            props(GraftSql.MvGroupProp),
            props(GraftSql.MvAggsProp),
            covered,
            src.exists && src.latestVersion.contains(covered),
            props.getOrElse(GraftSql.MvWhereProp, ""))
        }.orElse(props.get(graft.plans.JoinMv.FactProp).map { factRoot =>
          // join-shaped definition: fresh only when EVERY covered
          // snapshot is still its source's head
          val fact = VersionedTable(spark, factRoot)
          val dimTs = props(graft.plans.JoinMv.DimProp).split(";").toSeq
            .map(VersionedTable(spark, _))
          val fV = props(graft.plans.JoinMv.FactVersionProp).toLong
          val dVs = props(graft.plans.JoinMv.DimVersionProp)
            .split(";").toSeq.map(_.toLong)
          (s"$l.$t",
            props(graft.plans.JoinMv.GroupProp),
            props(graft.plans.JoinMv.AggsProp),
            fV,
            fact.exists && fact.latestVersion.contains(fV) &&
              dimTs.zip(dVs).forall { case (d, v) =>
                d.exists && d.latestVersion.contains(v)
              },
            s"join:${props(graft.plans.JoinMv.KeysProp)}" +
              props.get(graft.plans.JoinMv.DimFilterProp)
                .filter(_.exists(_ != ';'))
                // decode for display: the operator audits the predicate
                // TEXT, not its URL-encoded storage form
                .map(f => " where:" + f.split(";", -1)
                  .map(seg => if (seg.isEmpty) ""
                    else java.net.URLDecoder.decode(seg, "UTF-8"))
                  .mkString(";"))
                .getOrElse(""))
        })
      }.toDF("mv", "group_cols", "aggs", "covered_version", "fresh", "where")
    // governance (resources/uc/grants.sql): GRANT/REVOKE maintain the
    // warehouse's durable grants ledger; SHOW GRANTS reads it. The
    // ledger drives [[checkGrants]] enforcement once any grant exists
    // and the session names a principal.
    case GrantStmt(privs, otype, oname, principal) if catalog.isDefined =>
      import spark.implicits._
      val t = otype.toUpperCase; val n = normalizeGrantObj(t, oname)
      val ps = splitPrivs(privs)
      catalog.get.grantAll(ps, t, n, stripTicks(principal)) // all-or-nothing
      ps.map(p => ("grant", p, t, n, stripTicks(principal)))
        .toDF("op", "privilege", "object_type", "object", "principal")
    case RevokeStmt(privs, otype, oname, principal) if catalog.isDefined =>
      import spark.implicits._
      val t = otype.toUpperCase; val n = normalizeGrantObj(t, oname)
      val ps = splitPrivs(privs)
      catalog.get.revokeAll(ps, t, n, stripTicks(principal)) // one write
      ps.map(p => ("revoke", p, t, n, stripTicks(principal)))
        .toDF("op", "privilege", "object_type", "object", "principal")
    // refusal probe: a GRANT/REVOKE that missed the strict forms above
    // (arbitrary quoted principal, unknown object type, missing TO/FROM)
    // must fail NAMING the contract — Spark has no native GRANT, so the
    // fall-through would be an opaque INVALID_STATEMENT (found by the
    // script-splitting fuzzer planting a `;`-bearing backticked
    // principal)
    case GraftSql.GrantAdminHead(op) if catalog.isDefined =>
      sys.error(s"${op.toUpperCase(java.util.Locale.ROOT)}: unrecognized " +
        "form — expected `GRANT|REVOKE p1[, p2] ON TABLE|SCHEMA|CATALOG " +
        "<object> TO|FROM principal`, where the principal is a " +
        "keyword-shaped name (letters, digits, _ @ . -), optionally " +
        "backticked. Arbitrary quoted principals are unsupported by " +
        "design: the grants ledger stores plain names (see " +
        "resources/uc/grants.sql's group-name shape).")
    case ShowGrantsOnCatalogStmt() if catalog.isDefined =>
      grantsDf(catalog.get.grants.filter(_._2 == "CATALOG"))
    case ShowGrantsOnStmt(otype, oname) if catalog.isDefined =>
      val t = Option(otype).map(_.toUpperCase).getOrElse("TABLE")
      val n = normalizeGrantObj(t, oname)
      grantsDf(catalog.get.grants.filter(g => g._2 == t &&
        (t == "CATALOG" || g._3 == n)))
    case ShowGrantsToStmt(principal) if catalog.isDefined =>
      grantsDf(catalog.get.grants.filter(_._4 == stripTicks(principal)))
    case ShowGrantsStmt() if catalog.isDefined =>
      grantsDf(catalog.get.grants)
    case CreateTagStmt(ident, tag, v) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        val name = stripTicks(tag)
        t.createTag(name, Option(v).map(_.toLong))
        import spark.implicits._
        Seq((name, t.tags(name))).toDF("tag", "version")
      }
    case DropTagStmt(ident, tag) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        val tg = stripTicks(tag)
        // loud on unknown tags: a typo'd DROP TAG silently no-opping
        // would leave the operator believing a vacuum-exempt version
        // was released when it still pins retention
        require(t.tags.contains(tg),
          s"DROP TAG: no tag '$tg' on $ident (SHOW TAGS lists them)")
        t.dropTag(tg)
        import spark.implicits._
        Seq(tg).toDF("dropped_tag")
      }
    case ShowTagsStmt(ident) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        import spark.implicits._
        t.tags.toSeq.sortBy(_._1).toDF("tag", "version")
      }
    case ShowPinsStmt(ident) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        import spark.implicits._
        t.pinsDetail.toSeq.sortBy(_._1)
          .map { case (n, (v, ts)) =>
            (n, v, new java.sql.Timestamp(ts)) }
          .toDF("pin", "version", "pinned_at")
      }
    // catalog-wide SHOW PINS: one relation over EVERY table's pins —
    // the operator hunting what blocks reclamation across a warehouse
    // reads `behind` (head − floor) and `age_sec` (last-advanced age;
    // an abandoned checkpoint's pin keeps aging while live consumers
    // re-point every refresh) instead of probing tables one by one
    case ShowAllPinsStmt() =>
      val cat = catalog.getOrElse(sys.error(
        "SHOW PINS without a table needs a catalog-bound session"))
      import spark.implicits._
      val now = System.currentTimeMillis()
      cat.tables.flatMap { case (l, tn) =>
        val t = cat.table(l, tn)
        val head = t.latestVersion.getOrElse(-1L)
        t.pinsDetail.toSeq.sortBy(_._1).map { case (n, (v, ts)) =>
          // clamp: a pin on a table with no commits yet (head = -1, or
          // a pin at a version the log hasn't reached) must not report
          // negative `behind` — operators sort on non-negative lag
          (s"$l.$tn", n, v, head, math.max(0L, head - v),
            (now - ts) / 1000L, new java.sql.Timestamp(ts))
        }
      }.toDF("table", "pin", "version", "latest_version", "behind",
          "age_sec", "pinned_at")
        .orderBy("table", "pin")
    case DropPinStmt(ident, pin) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        t.dropPin(pin)
        import spark.implicits._
        Seq(pin).toDF("dropped_pin")
      }
    // DML statements delegate like ANALYZE below: an identifier that is
    // not a graft table (unknown layer, no catalog bound) falls through
    // to vanilla spark.sql — one funnel for the whole session
    // PARTITIONED BY / TBLPROPERTIES forms first: the plain CREATE
    // regex's greedy column capture would otherwise swallow the trailing
    // clauses as column DDL
    case CreateSchemaPartsStmt(orReplace, ident, colDefs, parts, props) =>
      ownedRoot(ident).fold(spark.sql(stmt)) { r =>
        val df = createEmpty(r, orReplace != null, colDefs,
          splitTop(parts, ',').map(stripTicks))
        if (props != null)
          VersionedTable(spark, r).setProperties(parseProps(props).toMap)
        df
      }
    case CreateSchemaPropsStmt(orReplace, ident, colDefs, props) =>
      ownedRoot(ident).fold(spark.sql(stmt)) { r =>
        val df = createEmpty(r, orReplace != null, colDefs)
        VersionedTable(spark, r).setProperties(parseProps(props).toMap)
        df
      }
    case CtasPropsStmt(orReplace, ident, parts, props, query) =>
      ownedRoot(ident).fold(spark.sql(stmt)) { r =>
        val df = ctas(r, orReplace != null,
          Option(parts).toSeq.flatMap(splitTop(_, ',')).map(stripTicks), query)
        VersionedTable(spark, r).setProperties(parseProps(props).toMap)
        df
      }
    case CreateSchemaStmt(orReplace, ident, colDefs) =>
      ownedRoot(ident).fold(spark.sql(stmt))(
        createEmpty(_, orReplace != null, colDefs))
    case CtasStmt(orReplace, ident, parts, query) =>
      ownedRoot(ident).fold(spark.sql(stmt))(ctas(_, orReplace != null,
        Option(parts).toSeq.flatMap(splitTop(_, ',')).map(stripTicks), query))
    case DropTableStmt(ifExists, ident) =>
      dropOwned(ident, ifExists != null).getOrElse(spark.sql(stmt))
    case UndropTableStmt(ident) =>
      undropOwned(ident)
    case MergeStmt(tgt, tAlias, src, sAlias, on, clauses) =>
      owned(tgt).fold(spark.sql(stmt))(
        mergeInto(_, tAlias, src, sAlias, on, clauses))
    case DeleteStmt(ident, cond) =>
      // graft.enableDeletionVectors=true routes DELETE to the
      // merge-on-read DV path (Delta's delta.enableDeletionVectors):
      // a point delete writes kilobytes of (file, position) sidecar
      // instead of rewriting every touched file-set. Otherwise a
      // range/equality-shaped predicate takes the stats-pruned
      // deleteRange (only overlapping file-sets rewrite — Delta prunes
      // DELETE by file stats the same way); anything else is full COW.
      owned(ident).fold(spark.sql(stmt)) { t =>
        versionDf(
          if (t.boolProp("graft.enableDeletionVectors"))
            t.deleteVectors(Option(cond).map(expr).getOrElse(lit(true)))
          else Option(cond).map(_.trim) match {
            case Some(c) => parseRangePred(c) match {
              case Some((rc, lo, hi)) => t.deleteRange(rc, lo, hi)
              case None               => t.delete(expr(c))
            }
            case None => t.delete(lit(true))
          })
      }
    case UpdateStmt(ident, sets, cond) =>
      // same stats-pruned routing for UPDATE (Delta's file-pruned
      // UPDATE): range/equality predicates rewrite only overlapping
      // file-sets — unless the assignment moves bucket/partition keys,
      // which a touched-sets-only rewrite cannot relocate
      owned(ident).fold(spark.sql(stmt)) { t =>
        val assigns = parseAssignments(sets)
        val keyCols = t.bucketSpec.map(sp => sp.keys ++ sp.partitionKeys)
          .getOrElse(t.partitionLayout).toSet
        val movesKeys = assigns.keySet.exists(keyCols.contains)
        versionDf(Option(cond).map(_.trim) match {
          case Some(c) => parseRangePred(c).filter(_ => !movesKeys) match {
            case Some((rc, lo, hi)) => t.updateRange(rc, lo, hi, assigns)
            case None               => t.update(assigns, expr(c))
          }
          case None => t.update(assigns, lit(true))
        })
      }
    case InsertReplaceStmt(ident, cond, query) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        versionDf(routeReplace(t, cond.trim,
          alignPositional(t, spark.sql(query))))
      }
    case InsertColsStmt(kind, ident, cols, query) =>
      owned(ident).fold(spark.sql(stmt))(
        insert(_, kind.equalsIgnoreCase("OVERWRITE"), query,
          Some(splitTop(cols, ',').map(stripTicks))))
    case InsertStmt(kind, ident, query) =>
      owned(ident).fold(spark.sql(stmt))(
        insert(_, kind.equalsIgnoreCase("OVERWRITE"), query))
    case TruncateStmt(ident) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        // schema-preserving empty overwrite: old versions stay readable
        // (time travel), partition layout carries through the rewrite.
        // Identity columns leave the frame (the write path stamps them
        // and refuses supplied values — zero rows either way).
        val empty = t.identityColumns.map(_._1)
          .foldLeft(t.read.limit(0))(_.drop(_))
        versionDf(t.overwrite(empty,
          partitionBy =
            t.bucketSpec.map(_.partitionKeys).getOrElse(t.partitionLayout)))
      }
    case CopyIntoStmt(ident, dir, fmt) =>
      ownedRoot(ident).fold(spark.sql(stmt))(r =>
        copyInto(VersionedTable(spark, r), dir, fmt))
    case AddColumnsStmt(ident, colDefs) =>
      owned(ident).fold(spark.sql(stmt))(t => versionDf(t.addColumns(colDefs)))
    case RenameColumnStmt(ident, from, to) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        val (f, tn) = (stripTicks(from), stripTicks(to))
        // an MV's GROUP columns are its merge-bucket keys AND its own
        // table columns — a rename cannot propagate (bucket keys refuse
        // renames: hash(old)≠hash(new) would re-route cells), so refuse
        // at the source like DROP does
        val groupDeps = mvsSourcedFrom(t.root).filter { case (_, props) =>
          props(GraftSql.MvGroupProp).split(",").contains(f) ||
            mvWhereCols(props).contains(f)
        }
        require(groupDeps.isEmpty,
          s"RENAME COLUMN: `$f` is a GROUP or WHERE column of " +
            s"materialized view(s) ${groupDeps.map(_._1).mkString(", ")} — " +
            "drop and recreate them to re-key")
        // join MVs: group columns and this side's JOIN KEYS refuse (the
        // MV's merge-bucket keys / the registered join condition cannot
        // re-key); agg-only columns re-key below like the single-table
        // path
        val joinHard = joinMvsSourcedFrom(t.root).filter {
          case (_, props, side) =>
            val segs = graft.plans.JoinMv.parseKeySegments(
              props(graft.plans.JoinMv.KeysProp))
            props(graft.plans.JoinMv.GroupProp).split(",").contains(f) ||
              (if (side < 0) segs.flatten.exists(_._1 == f)
               else segs(side).exists(_._2 == f) ||
                 joinMvDimFilterCols(props, side).contains(f))
        }
        require(joinHard.isEmpty,
          s"RENAME COLUMN: `$f` is a GROUP, JOIN-KEY, or dim-FILTER " +
            s"column of join materialized view(s) " +
            s"${joinHard.map(_._1).mkString(", ")} — " +
            "drop and recreate them to re-key")
        // sketch rollups: group columns are the rollup's merge-bucket
        // keys AND its own columns — refuse like MV groups; the
        // distinct column lives only in the definition — re-key below
        val sketchHard = sketchesSourcedFrom(t.root).filter {
          case (_, props) =>
            props(graft.ops.Sketches.GroupProp).split(",").contains(f)
        }
        require(sketchHard.isEmpty,
          s"RENAME COLUMN: `$f` is a GROUP column of sketch rollup(s) " +
            s"${sketchHard.map(_._1).mkString(", ")} — drop and " +
            "recreate them to re-key")
        // validated BEFORE the rename commits: a refusal below must not
        // leave the table renamed with a stale, un-re-keyed definition
        requireJoinMvRekeyUnambiguous(t.root, f)
        // a row filter / column mask referencing the column would stop
        // resolving (policy text cannot be re-keyed safely) — and a
        // governance policy that silently stops applying is a leak
        require(!governanceCols(t).contains(f),
          s"RENAME COLUMN: `$f` is referenced by a row filter or " +
            "column mask — drop the policy first")
        val df = versionDf(t.renameColumn(f, tn))
        // AGG source columns live only in the stored definition — re-key
        // them so later REFRESHes resolve under the new name (the
        // metadata sibling of VersionedTable.renameColumn re-keying
        // DEFAULTs and CLUSTER BY). Routing entries keep the old logical
        // names and simply stop matching until the next REFRESH re-arms
        // (safe: old-name queries can no longer resolve at all).
        rekeyDependentMvAggs(t.root, f, tn)
        rekeyDependentJoinMvAggs(t.root, f, tn)
        rekeyDependentSketchDistinct(t.root, f, tn)
        df
      }
    case DropColumnStmt(ident, c) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        val name = stripTicks(c)
        // a column a registered MV aggregates or groups by must not be
        // dropped out from under it — every later REFRESH would fail
        // (same refusal class as bucket keys / CHECK references)
        val dependents = mvsSourcedFrom(t.root).filter { case (_, props) =>
          mvReferencedCols(props).contains(name)
        }
        require(dependents.isEmpty,
          s"DROP COLUMN: `$name` is referenced by materialized view(s) " +
            s"${dependents.map(_._1).mkString(", ")} — drop them first")
        val joinDeps = joinMvsSourcedFrom(t.root).filter {
          case (_, props, side) =>
            val segs = graft.plans.JoinMv.parseKeySegments(
              props(graft.plans.JoinMv.KeysProp))
            props(graft.plans.JoinMv.GroupProp).split(",")
              .contains(name) ||
              GraftSql.parseAggSpecs(props(graft.plans.JoinMv.AggsProp))
                .exists(_._2 == name) ||
              (if (side < 0) segs.flatten.exists(_._1 == name)
               else segs(side).exists(_._2 == name) ||
                 joinMvDimFilterCols(props, side).contains(name))
        }
        require(joinDeps.isEmpty,
          s"DROP COLUMN: `$name` is referenced by join materialized " +
            s"view(s) ${joinDeps.map(_._1).mkString(", ")} — drop them first")
        val sketchDeps = sketchesSourcedFrom(t.root).filter {
          case (_, props) =>
            props(graft.ops.Sketches.GroupProp).split(",")
              .contains(name) ||
              props(graft.ops.Sketches.DistinctProp) == name
        }
        require(sketchDeps.isEmpty,
          s"DROP COLUMN: `$name` is referenced by sketch rollup(s) " +
            s"${sketchDeps.map(_._1).mkString(", ")} — drop them first")
        require(!governanceCols(t).contains(name),
          s"DROP COLUMN: `$name` is referenced by a row filter or " +
            "column mask — drop the policy first")
        versionDf(t.dropColumn(name))
      }
    case SetDefaultStmt(ident, c, dexpr) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        val name = stripTicks(c)
        require(t.read.columns.contains(name),
          s"SET DEFAULT: no column `$name` in ${t.root}")
        t.setDefault(name, dexpr.trim)
        import spark.implicits._
        Seq((name, dexpr.trim)).toDF("column", "default_expr")
      }
    case DropDefaultStmt(ident, c) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        t.dropDefault(stripTicks(c))
        import spark.implicits._
        Seq(stripTicks(c)).toDF("dropped_default")
      }
    case RenameTableStmt(src, dst) =>
      (ownedRoot(src), ownedRoot(dst)) match {
        case (Some(s), Some(d)) => renameTable(src, s, dst, d)
        case _                  => spark.sql(stmt)
      }
    case AlterColTypeStmt(ident, c, typeDdl) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        val name = stripTicks(c)
        val dt = org.apache.spark.sql.types.StructType
          .fromDDL(s"__x $typeDdl").fields(0).dataType
        t.widenColumnType(name, dt)
        import spark.implicits._
        Seq((name, dt.simpleString)).toDF("column", "new_type")
      }
    // Row filters and column masks (Databricks/UC read governance):
    // durable in table properties, enforced on every registered-view
    // read (Catalog.registerViews binds governedRead). Validated HERE —
    // a predicate/mask that cannot resolve must fail the DDL, not every
    // later SELECT. current_principal() resolves to the live-bound
    // expression, so validation is principal-independent by nature.
    case SetRowFilterStmt(ident, pred) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        import spark.implicits._
        graft.functions.CurrentPrincipal.register(spark)
        val p = pred.trim
        t.read.filter(expr(p)).queryExecution.analyzed
        t.setProperties(Map(GraftSql.RowFilterProp -> p))
        Seq((ident, p)).toDF("table", "row_filter")
      }
    case DropRowFilterStmt(ident) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        import spark.implicits._
        t.unsetProperties(Seq(GraftSql.RowFilterProp))
        Seq(ident).toDF("dropped_row_filter")
      }
    case SetMaskStmt(ident, c, m) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        import spark.implicits._
        val name = stripTicks(c)
        val schema = t.read.schema
        require(schema.fieldNames.contains(name),
          s"SET MASK: no column `$name` in ${t.root}")
        val mexpr = m.trim
        graft.functions.CurrentPrincipal.register(spark)
        // the mask may reference the row's other columns; it must cast
        // back to the column's own type (schema-stable governance)
        t.read.select(expr(mexpr)
          .cast(schema(name).dataType)).queryExecution.analyzed
        t.setProperties(Map(GraftSql.ColumnMaskPrefix + name -> mexpr))
        Seq((name, mexpr)).toDF("column", "mask_expr")
      }
    case DropMaskStmt(ident, c) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        import spark.implicits._
        t.unsetProperties(Seq(GraftSql.ColumnMaskPrefix + stripTicks(c)))
        Seq(stripTicks(c)).toDF("dropped_mask")
      }
    case SetNotNullStmt(ident, c) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        val name = stripTicks(c)
        require(t.read.columns.contains(name),
          s"SET NOT NULL: no column `$name` in ${t.root}")
        // same constraint shape the CREATE TABLE `c TYPE NOT NULL` form
        // records, so DESCRIBE shows one vocabulary and DROP NOT NULL
        // finds it; addCheck scans current rows and refuses on NULLs
        // (Delta's SET NOT NULL validation)
        t.addCheck(s"${name}_not_null", s"$name IS NOT NULL")
        import spark.implicits._
        Seq((name, s"$name IS NOT NULL")).toDF("column", "constraint_expr")
      }
    case DropNotNullStmt(ident, c) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        t.dropCheck(s"${stripTicks(c)}_not_null")
        import spark.implicits._
        Seq(stripTicks(c)).toDF("dropped_not_null")
      }
    case ShowColumnsStmt(ident) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        import spark.implicits._
        t.read.columns.toSeq.toDF("col_name")
      }
    case SetPartitionedByStmt(ident, cols) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        val cs = splitTop(cols, ',').map(stripTicks).filter(_.nonEmpty)
        versionDf(t.evolvePartitionLayout(cs))
      }
    case ClusterByStmt(ident, cols, none) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        import spark.implicits._
        if (none != null) {
          t.unsetProperties(Seq("graft.clusterBy"))
          Seq("NONE").toDF("cluster_by")
        } else {
          // merge-bucketed tables refuse at DECLARATION time: their
          // OPTIMIZE unit is the (partition, bucket) cell and z-ordering
          // would break copy-on-write merge routing — the same line
          // compactZOrder draws, moved to where the user can see it
          require(t.bucketSpec.isEmpty,
            s"CLUSTER BY: ${t.root} is merge-bucketed; its layout IS " +
              "its clustering (OPTIMIZE compacts per cell)")
          val cs = splitTop(cols, ',').map(stripTicks)
          require(cs.nonEmpty, "CLUSTER BY needs at least one column")
          val missing = cs.filterNot(t.read.columns.contains)
          require(missing.isEmpty,
            s"CLUSTER BY unknown column(s): ${missing.mkString(",")}")
          t.setProperties(Map(VersionedTable.ClusterByProp ->
            cs.mkString(",")))
          Seq(cs.mkString(",")).toDF("cluster_by")
        }
      }
    case AddPkStmt(ident, name, cols, rely) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        t.addPrimaryKey(name, splitTop(cols, ',').map(stripTicks), rely != null)
        graft.plans.JoinElim.arm(t)
        import spark.implicits._
        Seq((name, "PRIMARY KEY", rely != null)).toDF(
          "constraint", "kind", "rely")
      }
    case AddFkStmt(ident, name, cols, refIdent, refCols, rely) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        val ref = resolve(refIdent)
        val rc = Option(refCols).map(splitTop(_, ',').map(stripTicks))
          .getOrElse(ref.primaryKey.map(_._2).getOrElse(sys.error(
            s"FOREIGN KEY: $refIdent declares no primary key — name " +
              "the referenced columns explicitly")))
        val missing = rc.filterNot(ref.read.columns.contains)
        require(missing.isEmpty,
          s"FOREIGN KEY: $refIdent lacks column(s) ${missing.mkString(",")}")
        t.addForeignKey(name, splitTop(cols, ',').map(stripTicks),
          ref.root, rc, rely != null)
        graft.plans.JoinElim.arm(t)
        import spark.implicits._
        Seq((name, "FOREIGN KEY", rely != null)).toDF(
          "constraint", "kind", "rely")
      }
    case AddConstraintStmt(ident, name, checkExpr) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        // multiline/aligned DDL is legal SQL, but the named-expr ledger
        // stores exprs line-framed and SHOW CREATE surfaces them
        // verbatim: whitespace outside string literals canonicalizes to
        // single spaces (semantics-preserving — found by the grammar
        // fuzzer, SqlFuzzSpec)
        val ce = collapseExprWs(checkExpr)
        t.addCheck(name, ce)
        import spark.implicits._
        Seq((name, ce)).toDF("constraint", "check_expr")
      }
    case CommentTableStmt(ident, text) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        import spark.implicits._
        if (text.equalsIgnoreCase("NULL")) t.unsetProperties(Seq("comment"))
        else t.setProperties(Map("comment" -> unquoteComment(text)))
        Seq(ident).toDF("commented")
      }
    case CommentColumnStmt(dotted, text) =>
      val cut = dotted.lastIndexOf('.')
      require(cut > 0, s"COMMENT ON COLUMN: need table.column, got $dotted")
      val (ident, c) = (dotted.substring(0, cut), dotted.substring(cut + 1))
      owned(ident).fold(spark.sql(stmt)) { t =>
        import spark.implicits._
        require(t.read.columns.contains(c),
          s"COMMENT ON COLUMN: no column `$c` at ${t.root}")
        val key = GraftSql.ColumnCommentPrefix + c
        if (text.equalsIgnoreCase("NULL")) t.unsetProperties(Seq(key))
        else t.setProperties(Map(key -> unquoteComment(text)))
        Seq(dotted).toDF("commented")
      }
    case DropConstraintStmt(ident, name) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        // loud on unknown names (engine contract): a typo'd DROP that
        // silently no-ops would leave the operator believing the
        // constraint is gone while it still enforces / fires JoinElim
        if (!t.dropKeyConstraint(name)) {
          require(t.checks.exists(_._1 == name),
            s"DROP CONSTRAINT: no constraint named $name on $ident " +
              "(neither CHECK nor PRIMARY/FOREIGN KEY — DESCRIBE " +
              "lists the live set)")
          t.dropCheck(name)
        }
        graft.plans.JoinElim.arm(t) // a dropped RELY key must stop firing NOW
        import spark.implicits._
        Seq(name).toDF("dropped_constraint")
      }
    case ConvertStmt(srcDir, target) => convert(srcDir, targetRoot(target))
    // ANALYZE is the one owned statement that is ALSO valid vanilla
    // Spark SQL — an identifier that isn't a graft table (unknown layer,
    // no catalog bound, not found) delegates instead of erroring, so the
    // funnel keeps its parse-what-you-own contract for catalog tables
    // and temp views
    case AnalyzeAllStmt(ident) =>
      scala.util.Try(resolve(ident)).toOption.fold(spark.sql(stmt)) { t =>
        // every atomic column — arrays/maps/structs/binary have no
        // useful min/max order for skipping sidecars
        import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType,
          StructType => SType}
        val cols = t.read.schema.fields
          .filterNot(f => f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[SType] || f.dataType == BinaryType)
          .map(_.name)
        analyze(t, cols.mkString(","))
      }
    case AnalyzeStmt(ident, cols) =>
      scala.util.Try(resolve(ident)).toOption
        .fold(spark.sql(stmt))(analyze(_, cols))
    case SetPropsStmt(ident, props) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        t.setProperties(parseProps(props).toMap)
        showProps(t)
      }
    case UnsetPropsStmt(ident, ifExists, keys) =>
      owned(ident).fold(spark.sql(stmt)) { t =>
        val ks = splitTop(keys, ',').map(k => unquote(k))
        if (ifExists == null) {
          val missing = ks.filterNot(t.properties.contains)
          require(missing.isEmpty, "UNSET TBLPROPERTIES: unknown key(s) " +
            s"${missing.mkString(", ")} (use IF EXISTS)")
        }
        t.unsetProperties(ks)
        showProps(t)
      }
    case ShowPropsStmt(ident) =>
      owned(ident).fold(spark.sql(stmt))(showProps)
    case ShowPartitionsStmt(ident) =>
      owned(ident).fold(spark.sql(stmt))(showPartitions)
    case ShowCreateStmt(ident) =>
      owned(ident).fold(spark.sql(stmt))(showCreate)
    case ShowTablesStmt() =>
      catalog.fold(spark.sql(stmt)) { c =>
        import spark.implicits._
        c.tables.toDF("namespace", "tableName")
      }
    case ReorgStmt(ident) =>
      versionDf(resolve(ident).purgeDeleteVectors())
    case GenerateManifestStmt(ident) =>
      // resolve, not delegate: vanilla Spark has no GENERATE statement,
      // so an unknown identifier must fail with OUR message
      import spark.implicits._
      Seq(resolve(ident).generateSymlinkManifest())
        .toDF("n_manifest_files")
    case DescHistoryStmt(ident) => resolve(ident).historyDf
    case DescDetailStmt(ident)  => resolve(ident).detailDf
    // plain DESCRIBE <table>: the Spark-shaped (col_name, data_type,
    // comment) relation, with identity/generated contracts surfaced in
    // the comment column. Non-graft identifiers delegate. Tried after
    // HISTORY/DETAIL so those keywords never parse as table names.
    case DescTableStmt(ident) =>
      scala.util.Try(resolve(ident)).toOption
        .fold(spark.sql(stmt))(describeTable)
    // EXPLAIN REWRITE <query>: the MV-routing decision relation —
    // which armed MV serves each aggregate and WHY, or why not
    // (rejected / stale-fell-back / shape-bail / no-candidates) —
    // without executing the query. Time-travel pins resolve like any
    // SELECT so `EXPLAIN REWRITE SELECT … FROM t@v3 …` works too.
    case ExplainRewriteStmt(inner) =>
      val (tt, ttViews) = rewriteTimeTravel(inner)
      try {
        import spark.implicits._
        graft.plans.MvRewrite.explainRewrite(spark.sql(tt))
          .toDF("aggregate", "mv", "decision", "reason")
      } finally ttViews.foreach(spark.catalog.dropTempView)
    case other =>
      val (tt, ttViews) = rewriteTimeTravel(other)
      val (rewritten, tcViews) = rewriteTableChanges(tt)
      val views = ttViews ++ tcViews
      // analysis inlines a temp view's plan into the DataFrame, so the
      // views can drop as soon as spark.sql returns — nothing
      // accumulates in the session and no later statement can observe
      // (or race against) a stale pin. EXCEPT view-creating statements:
      // since Spark 3.1 a SQL-created view stores the PARSED plan and
      // re-resolves on every reference, so `CREATE TEMP VIEW x AS
      // SELECT … VERSION AS OF n` must keep its asof pins registered or
      // x fails with "table not found" on first use — those leak for
      // the session, the price of deferred resolution
      val createsView = """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?""" +
        """(GLOBAL\s+)?(TEMP(ORARY)?\s+)?VIEW\b.*"""
      try spark.sql(rewritten)
      finally if (!other.matches(createsView))
        views.foreach(spark.catalog.dropTempView)
  }

  /** Delta's `table_changes('t', start [, end])` table-valued function:
    * each call is materialized as the change-feed relation of versions
    * [start, end] (end defaults to the head) under a session temp view
    * and the statement rewritten to read it — the SQL face of
    * [[VersionedTable.readChangeFeed]], same per-row `_change_type` /
    * `_commit_version` columns. Non-graft names are left verbatim. */
  private def rewriteTableChanges(stmt: String): (String, Seq[String]) = {
    if (!TableChangesProbe.pattern.matcher(stmt).find()) return (stmt, Nil)
    val views = scala.collection.mutable.ArrayBuffer.empty[String]
    // a table_changes(...) that STARTS inside a string literal is data
    // (the call's own quoted ident doesn't trip this: its match starts
    // at the function name, outside any literal)
    val mask = GraftSql.stringLiteralMask(stmt)
    val out = TableChangesCall.replaceAllIn(stmt, m => {
      if (mask(m.start))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else {
      val ident = m.group(1)
      owned(ident) match {
        case Some(t) =>
          val start = m.group(2).toLong
          val end = Option(m.group(3)).map(_.toLong)
          val view = s"__graft_tc_${GraftSql.asofViewId.incrementAndGet()}_" +
            math.abs(ident.hashCode)
          // readChangeFeed's lower bound is exclusive; table_changes'
          // start is inclusive
          t.readChangeFeed(start - 1, end).createOrReplaceTempView(view)
          views += view
          view
        case None => java.util.regex.Matcher.quoteReplacement(m.matched)
      }
      }
    })
    (out, views.toSeq)
  }

  /** Inline time travel inside arbitrary SELECTs (Delta's
    * `FROM t VERSION AS OF n` / `TIMESTAMP AS OF 'ts'`): each graft
    * table reference followed by an AS OF clause is materialized as the
    * pinned-version relation under a session temp view and the
    * statement rewritten to read it — so old-vs-new comparisons join
    * freely in one statement. Non-graft identifiers are left verbatim
    * (Spark raises its own error). View registration is metadata-only;
    * no data is read until the rewritten statement executes. */
  private def rewriteTimeTravel(stmt: String): (String, Seq[String]) = {
    if (!TimeTravelProbe.pattern.matcher(stmt).find() &&
      !AtVersionProbe.pattern.matcher(stmt).find()) return (stmt, Nil)
    val views = scala.collection.mutable.ArrayBuffer.empty[String]
    def bind(ident: String, df: Option[DataFrame], matched: String): String =
      df match {
        case Some(d) =>
          // session-unique id: two statements pinning the same table at
          // different versions must never collide on a view name, even
          // when issued concurrently on one session
          val view = s"__graft_asof_${GraftSql.asofViewId.incrementAndGet()}_" +
            math.abs(ident.hashCode)
          d.createOrReplaceTempView(view)
          views += view
          view
        case None => java.util.regex.Matcher.quoteReplacement(matched)
      }
    val pass1 = TimeTravelVersion.replaceAllIn(stmt, m =>
      bind(m.group(1),
        owned(m.group(1)).map(_.readVersion(m.group(2).toLong)), m.matched))
    // VERSION AS OF '<tag>' — named snapshot pins (quoted, so it can
    // never collide with the numeric form)
    val pass1t = TimeTravelTag.replaceAllIn(pass1, m =>
      bind(m.group(1),
        owned(m.group(1)).map(_.readTag(m.group(2))), m.matched))
    val pass2 = TimeTravelTimestamp.replaceAllIn(pass1t, m =>
      bind(m.group(1),
        owned(m.group(1)).map(_.asOf(parseTsUtc(m.group(2)))), m.matched))
    // `t@v3` shorthand (Delta's @ syntax): rewritten ONLY outside string
    // literals — '@v<digits>' is plausible in real data (emails,
    // handles), so a literal containing a table-name-shaped prefix must
    // stay verbatim; outside literals, only a RESOLVABLE table name
    // directly before @vN pins
    val pass3 = GraftSql.mapOutsideLiterals(pass2)(seg =>
      AtVersion.replaceAllIn(seg, m =>
        bind(m.group(1),
          owned(m.group(1)).map(_.readVersion(m.group(2).toLong)),
          m.matched)))
    (pass3, views.toSeq)
  }

  private def convert(srcDir: String, target: String): DataFrame = {
    import spark.implicits._
    val t = new VersionedTable(spark, target)
    val e = t.convertFrom(srcDir)
    Seq((e.action, e.version, e.fileSets.length.toLong))
      .toDF("operation", "version", "n_file_sets")
  }

  /** `'it''s'` → `it's` (SQL single-quote literal). */
  private def unquoteComment(lit: String): String =
    lit.stripPrefix("'").stripSuffix("'").replace("''", "'")

  /** DESCRIBE <table> — Spark's (col_name, data_type, comment) shape;
    * the comment column carries the engine-enforced column contracts
    * (identity, generated expression) so the DDL surface is
    * discoverable without reading metadata files. */
  private def describeTable(tbl: VersionedTable): DataFrame = {
    import spark.implicits._
    val idents = tbl.identityColumns.map(c => c._1 ->
      s"GENERATED ALWAYS AS IDENTITY (START WITH ${c._2} INCREMENT BY ${c._3})").toMap
    val gens = tbl.generatedColumns.map(c => c._1 ->
      s"GENERATED ALWAYS AS (${c._2})").toMap
    val dflts = tbl.defaultColumns.map(c => c._1 ->
      s"DEFAULT ${c._2}").toMap
    val user = tbl.properties.collect {
      case (k, v) if k.startsWith(GraftSql.ColumnCommentPrefix) =>
        k.stripPrefix(GraftSql.ColumnCommentPrefix) -> v
    }
    tbl.read.schema.fields.toSeq.map { f =>
      val contract = idents.getOrElse(f.name,
        gens.getOrElse(f.name, dflts.getOrElse(f.name, "")))
      (f.name, f.dataType.catalogString,
        Seq(user.getOrElse(f.name, ""), contract)
          .filter(_.nonEmpty).mkString("; "))
    }.toDF("col_name", "data_type", "comment")
  }

  private def analyze(tbl: VersionedTable, cols: String): DataFrame = {
    import spark.implicits._
    val names = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
      .filter(_.nonEmpty).toSeq
    Seq(tbl.computeStats(names).toLong).toDF("n_file_sets_analyzed")
  }

  private def clone(src: VersionedTable, target: String): DataFrame = {
    import spark.implicits._
    val t = src.shallowCloneTo(target)
    val e = t.history.last
    Seq((e.action, src.latestVersion.getOrElse(-1L),
        e.fileSets.length.toLong))
      .toDF("operation", "source_version", "n_file_sets")
  }

  // --------------------------------------------------- materialized views

  /** CREATE [OR REPLACE] MATERIALIZED VIEW mv AS
    *   SELECT g1, ..., sum(c) AS s, count(*) AS n, ... FROM src GROUP BY g1, ...
    *
    * Materializes the aggregate as a versioned table, records the
    * definition + covered source version in table properties (durable —
    * REFRESH re-reads it in any later process), and arms
    * [[graft.plans.MvRewrite]] so matching aggregates over the covered
    * snapshot route to the MV transparently. `avg` is deliberately not
    * materializable: write `sum(c) AS s_c, count(c) AS n_c` and the
    * rewrite rule derives `avg(c)` from the pair — an incrementally
    * maintained average column would be wrong under merge combining. */
  private def createMaterializedView(mvIdent: String, orReplace: Boolean,
                                     selectList: String, srcIdent: String,
                                     whereRaw: Option[String],
                                     groupBy: String): DataFrame = {
    import spark.implicits._
    // multiline/aligned DDL is legal SQL, but the WHERE predicate
    // persists verbatim in the MV's properties (line-framed ledger, and
    // every maintenance slice re-parses it): canonicalize whitespace
    // outside string literals, same as CHECK constraints (found by the
    // grammar fuzzer)
    val where = whereRaw.map(GraftSql.collapseExprWs)
    GraftSql.registerMvFunctions(spark)
    val src = resolve(srcIdent)
    val (groupCols, aggs) = GraftSql.parseMvSelect(selectList, groupBy)
    val srcCols = src.read.columns.toSet
    val missing = (groupCols ++ aggs.map(_._2).filterNot(_ == "*"))
      .filterNot(srcCols)
    require(missing.isEmpty,
      s"materialized view: source $srcIdent lacks columns ${missing.mkString(",")}")
    val mv = VersionedTable(spark, targetRoot(mvIdent))
    require(orReplace || !mv.exists,
      s"materialized view target exists: $mvIdent (use CREATE OR REPLACE)")
    val srcV = src.latestVersion.getOrElse(
      sys.error(s"materialized view over empty table $srcIdent"))
    // materialize from the PINNED snapshot, not the live head: a
    // concurrent commit between latestVersion and the read would land
    // rows the recorded covered-version does not cover, and the next
    // REFRESH would absorb them a second time
    // OR REPLACE with a DIFFERENT group set: the old definition's
    // refresh merges bucketed the MV on the old keys — a stale spec
    // would fail (or mis-bucket) every later incremental refresh
    // epoch bump: a REPLACE starts a fresh txn-ledger namespace, so
    // merge markers from the previous definition (or from a source
    // recreated at the same root with a restarted version counter)
    // cannot masquerade as this era's absorbed slices
    val epoch = (if (mv.exists)
      mv.properties.get(GraftSql.MvEpochProp).map(_.toLong).getOrElse(0L)
    else 0L) + 1L
    // a replaced JOIN / sketch / CMS / quantile definition's properties
    // must go, or the REFRESH dispatch would see two definitions
    graft.ops.Sketches.clearReplacedDefinition(mv)
    val base0 = src.readVersion(srcV)
    val base = where.fold(base0) { p =>
      val f = base0.filter(expr(p))
      // resolution runs now (bad columns fail the CREATE loudly); a
      // nondeterministic predicate (rand()) would make every
      // maintenance slice disagree with the materialization — refuse
      val cond = f.queryExecution.analyzed.collectFirst {
        case fl: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          fl.condition
      }
      require(cond.exists(_.deterministic),
        s"materialized view WHERE must be deterministic: $p")
      f
    }
    mv.overwrite(base.groupBy(groupCols.map(col): _*)
      .agg(GraftSql.mvAggColumns(aggs).head,
        GraftSql.mvAggColumns(aggs).tail: _*))
    // a REPLACE that drops the predicate must also drop the property
    if (where.isEmpty) mv.unsetProperties(Seq(GraftSql.MvWhereProp))
    mv.setProperties(Map(
      GraftSql.MvSourceProp -> src.root,
      GraftSql.MvGroupProp -> groupCols.mkString(","),
      GraftSql.MvAggsProp ->
        aggs.map { case (f, c, o) => s"$f:$c:$o" }.mkString(";"),
      GraftSql.MvVersionProp -> srcV.toString,
      GraftSql.MvEpochProp -> epoch.toString) ++
      where.map(GraftSql.MvWhereProp -> _))
    // retention floor on the source: vacuum must not reclaim the
    // covered version or the change/added sets above it, or every
    // REFRESH after retention degrades to a full recompute
    src.setPin(graft.plans.JoinMv.pinName(mv), srcV)
    // filtered definitions never arm transparent routing: the rewrite
    // rule serves only shapes it can prove equivalent, and a query
    // without the predicate must keep scanning the source. A REPLACE
    // that turns an armed unfiltered MV into a filtered one must also
    // DROP the old registration — the source snapshot is unchanged, so
    // the stale entry would keep serving full-table aggregates from the
    // now-filtered materialization (silent wrong results)
    if (where.isEmpty) armMvRewrite(src, mv, groupCols, aggs, srcV)
    else graft.plans.MvRewrite.deregisterRoot(mv.root)
    Seq((mvIdent, "create", srcV)).toDF("mv", "mode", "source_version")
  }

  /** CREATE [OR REPLACE] MATERIALIZED VIEW mv AS
    *   SELECT g…, fn(c) AS out… FROM fact JOIN dim₁ USING (k,…)|ON …
    *   [JOIN dim₂ …] [WHERE <dim-side preds>] GROUP BY g…
    *
    * The join form: materialization, durable definition and routing via
    * [[graft.plans.JoinMv]] (fact-CDF incremental maintenance under the
    * fixed-dims identity; star schemas welcome — every dim is pinned).
    * Cross-side column ambiguity is refused up front. WHERE conjuncts
    * must each touch exactly ONE dim's (qualified) columns — the SCD2
    * current-view idiom `WHERE d.is_current` — and become that
    * [[graft.plans.JoinMv.DimSide]]'s row filter, so dim batches keep
    * absorbing as signed deltas; fact-side predicates are refused (the
    * single-table form owns source filters). */
  private def createJoinMaterializedView(mvIdent: String, orReplace: Boolean,
      selectList: String, factIdent: String,
      dims: Seq[(String, Seq[(String, String)])],
      where: Option[String], groupBy: String): DataFrame = {
    import spark.implicits._
    val fact = resolve(factIdent)
    val dimTables = dims.map { case (id, keys) => (id, resolve(id), keys) }
    val dimFilters = GraftSql.attributeJoinMvWhere(where, factIdent,
      dims.map(_._1))
    val (groupCols, aggs) = GraftSql.parseMvSelect(selectList, groupBy)
    val fCols = fact.read.columns.toSet
    val sideCols: Seq[(String, Set[String])] =
      (factIdent, fCols) +: dimTables.map { case (id, t, _) =>
        (id, t.read.columns.toSet)
      }
    val missing = (groupCols ++ aggs.map(_._2).filterNot(_ == "*"))
      .filterNot(c => sideCols.exists(_._2(c)))
    require(missing.isEmpty, s"materialized view: no join side has " +
      s"columns ${missing.mkString(",")}")
    // refuse cross-side ambiguity BEFORE materializing (the clear
    // message, not a mid-materialization analysis error). Same-named
    // KEY pairs are value-equal under the inner join, so they may
    // repeat between the fact and the dim they join.
    val sameNamedKeys = dims.flatMap(_._2)
      .collect { case (l, r) if l == r => l }.toSet
    (groupCols ++ aggs.map(_._2).filterNot(_ == "*")).foreach { n =>
      val carriers = sideCols.count(_._2(n))
      require(carriers <= 1 || sameNamedKeys(n),
        s"materialized view: column `$n` exists on multiple join " +
          "sides — ambiguous (only same-named key pairs may repeat)")
    }
    val mv = VersionedTable(spark, targetRoot(mvIdent))
    require(orReplace || !mv.exists,
      s"materialized view target exists: $mvIdent (use CREATE OR REPLACE)")
    // filter columns must exist on their dim (fail at CREATE, not at
    // the first refresh's analysis error)
    dimTables.zip(dimFilters).foreach { case ((id, t, _), flt) =>
      flt.foreach { f =>
        try t.read.filter(org.apache.spark.sql.functions.expr(f))
          .queryExecution.analyzed
        catch { case e: Throwable => sys.error(
          s"materialized view: WHERE predicate `$f` does not resolve " +
            s"against dim $id: ${e.getMessage}") }
      }
    }
    graft.plans.JoinMv.create(fact,
      dimTables.zip(dimFilters).map { case ((_, t, keys), flt) =>
        graft.plans.JoinMv.DimSide(t, keys, flt)
      },
      groupCols,
      aggs.map { case (f, c, o) => graft.plans.MvRewrite.AggSpec(f, c, o) },
      mv)
    Seq((mvIdent, "create",
      mv.properties(graft.plans.JoinMv.FactVersionProp).toLong))
      .toDF("mv", "mode", "source_version")
  }

  /** REFRESH MATERIALIZED VIEW mv — cheapest maintenance the source's
    * history shape allows, O(changed data) whenever expressible:
    *
    *   - append-only tail → delta aggregate over `readAddedSince` +
    *     combining bucket-COW merge ("incremental");
    *   - retractions (UPDATE/DELETE/merge) with the source's change feed
    *     on → signed-delta refresh from the row-level CDF
    *     (+postimage/insert, −preimage/delete), provided every aggregate
    *     is sum/count, count(*) is materialized (emptied groups must
    *     drop, as a recompute would) and every sum(c) has a count(c)
    *     companion (a group whose surviving c-values are all NULL must
    *     show sum NULL, not an arithmetic 0 — the classic incremental-MV
    *     retraction bug) ("cdf");
    *   - retractions with CDF on but min/max (or a sum missing its
    *     count companion) in the agg set → per-touched-group recompute:
    *     the feed names the groups that moved, only those groups
    *     re-aggregate from the pinned snapshot and merge (vanished
    *     groups delete as merge tombstones) — O(changed groups), not
    *     O(table) ("groups");
    *   - anything else → full recompute ("full").
    *
    * Either way the covered version advances and the rewrite rule
    * re-arms — REFRESH is also the re-arm point after a process restart
    * (the rewrite registry is in-memory; the definition is not). */
  private def refreshMaterializedView(mvIdent: String): DataFrame = {
    import spark.implicits._
    GraftSql.registerMvFunctions(spark)
    val mv = resolve(mvIdent)
    val props = mv.properties
    val srcRoot = props.getOrElse(GraftSql.MvSourceProp,
      sys.error(s"$mvIdent is not a materialized view (no " +
        s"${GraftSql.MvSourceProp} property)"))
    val src = VersionedTable(spark, srcRoot)
    val groupCols = props(GraftSql.MvGroupProp).split(",").toSeq
    val aggs = GraftSql.parseAggSpecs(props(GraftSql.MvAggsProp))
    val v0Prop = props(GraftSql.MvVersionProp).toLong
    // exactly-once across crash+retry: the merge's txn ledger is the
    // authoritative record of the last slice actually ABSORBED. A crash
    // between the merge commit and the MvVersionProp bump leaves the
    // ledger ahead of the property — and if the source takes new commits
    // before the retry, a property-based resume would recompute a LARGER
    // slice whose merge passes the replay guard (lastTxn < new srcV) and
    // double-counts the already-merged prefix. Resuming from
    // max(property, ledger) makes the retry apply only the uncovered
    // tail; when they agree this is the property, unchanged behavior.
    // The app id carries the CREATE epoch so ledger entries from a
    // replaced definition era can never be consulted.
    val txnApp = GraftSql.MvTxnApp +
      props.getOrElse(GraftSql.MvEpochProp, "0") + ":" + mv.root
    val ledgerV = mv.lastTxnVersion(txnApp)
    val v0 = math.max(v0Prop, ledgerV.getOrElse(v0Prop))
    // ledger-healed resume: the ledger ahead of the property means the
    // last slice's markered merge committed but the refresh died before
    // its follow-up emptied-group delete / sum NULL-fix (and property
    // bump) ran. Those follow-ups live OUTSIDE the marker's txn, so a
    // resume that reads the slice as covered would otherwise serve
    // phantom zero-count groups until the next non-empty delta. The
    // sweep is idempotent and probe-guarded — a clean resume pays two
    // short reads and commits nothing.
    if (ledgerV.exists(_ > v0Prop) && GraftSql.cdfMaintainable(aggs))
      GraftSql.sweepCdfPhantoms(mv, aggs)
    // ONE history read: srcV (the version this refresh will cover) and
    // the commit slice it maintains over must agree even while
    // concurrent writers advance the head
    val srcHistory = src.history
    val srcV = srcHistory.lastOption.map(_.version).getOrElse(v0)
    val later = srcHistory.filter(e => e.version > v0 && e.version <= srcV)
    val cdfCapable = src.changeFeedEnabled && GraftSql.cdfMaintainable(aggs)
    // a FILTERED definition applies its predicate to every slice — the
    // materialization, each incremental delta, the change feed (an
    // update moving a row across the predicate boundary keeps exactly
    // the matching image: in = +post, out = −pre, the correct signed
    // delta), the touched-group set, and the per-group recompute
    val where = props.get(GraftSql.MvWhereProp)
    def filt(df: DataFrame): DataFrame = where.fold(df)(p => df.filter(expr(p)))
    // every maintenance path reads the PINNED range (v0, srcV] — never
    // the live head — so concurrent commits stay uncovered until the
    // NEXT refresh instead of being absorbed now and re-absorbed then
    def recompute(): Unit =
      mv.overwrite(filt(src.readVersion(srcV)).groupBy(groupCols.map(col): _*)
        .agg(GraftSql.mvAggColumns(aggs).head,
          GraftSql.mvAggColumns(aggs).tail: _*))
    // compact/zorder/REORG PURGE are data-identical by construction,
    // and rename/drop-column commits are metadata-only (zero rows; the
    // DDL guards above refuse touching MV-referenced columns and re-key
    // agg specs on rename) — a slice of pure maintenance/DDL has
    // NOTHING to absorb (the covered version still bumps and routing
    // re-arms on the new snapshot), and either kind interleaved with
    // appends keeps the incremental path: readAddedBetween reads
    // exactly the appended rows by their original file-set ids under
    // the CURRENT column mapping (addedSetsLive guards the rare
    // vacuum-reclaimed-original case into the fallback instead of a
    // mid-read failure). Without this, the first OPTIMIZE or RENAME on
    // the source demoted every later REFRESH to a full recompute.
    val absorbless = GraftSql.AbsorblessActions
    val mode =
      if (later.isEmpty) "noop"
      else if (later.forall(e => absorbless(e.action))) "noop"
      else if (later.forall(e =>
          e.action == "append" || absorbless(e.action)) &&
          src.addedSetsLive(v0, srcV)) {
        // persisted: the NULL-key probe and the merge share one
        // aggregation pass (the delta is group-count-sized)
        val delta = filt(src.readAddedBetween(v0, srcV))
          .groupBy(groupCols.map(col): _*)
          .agg(GraftSql.mvAggColumns(aggs).head,
            GraftSql.mvAggColumns(aggs).tail: _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // NULL group values cannot ride the merge (SQL MERGE: NULL
          // never matches, so every refresh would INSERT a fresh NULL
          // row) — a delta touching the NULL group recomputes instead.
          // Full-consumption probe: materializes the persist too.
          if (GraftSql.probeDelta(delta, groupCols)._2 > 0L) {
            recompute(); "full" }
          else {
            // txn marker: a crash between this commit and the covered-
            // version bump replays as a metadata no-op, not a double-count
            mv.merge(delta, groupCols, updateExprs = aggs.map {
              case (f, _, o) => o -> GraftSql.mvCombine(f)
            }.toMap, txn = Some((txnApp, srcV)))
            "incremental"
          }
        } finally { delta.unpersist(); () }
      } else if (cdfCapable) {
        // the feed can refuse mid-slice shapes it cannot express
        // (overwrite/restore commit no change set; vacuum may have
        // reclaimed old sets; NULL group keys cannot merge) — ONLY those
        // curated refusals fall back to the full recompute, which is
        // always safe: the refusal happens while PLANNING the feed read,
        // before any merge commits, and even a post-merge failure is
        // healed by the overwrite. Every other error (merge-key/bucket
        // mismatch, missing MV columns, schema drift) propagates —
        // masking a misconfiguration as a silent recompute would hide
        // the bug behind a performance blip.
        try {
          GraftSql.applyCdfDelta(mv,
            filt(src.readChangeFeed(v0, Some(srcV))), groupCols, aggs,
            txn = Some((txnApp, srcV)))
          "cdf"
        } catch {
          case _: CdfNotExpressible => recompute(); "full"
        }
      } else if (src.changeFeedEnabled) {
        // min/max (or a sum without its count companion) cannot absorb
        // retractions as signed deltas — but the feed still identifies
        // WHICH groups moved. Recompute ONLY those groups from the
        // pinned snapshot and merge: the aggregation shuffles only the
        // touched groups' rows (AQE broadcasts the touched-key set when
        // small, so the semi join adds no shuffle of the source), and MV
        // writes are O(touched cells) bucket-COW — untouched MV rows
        // ride their file-sets unrewritten, never recomputed. Vanished
        // groups delete through the merge-tombstone path, committed
        // BEFORE the replace merge: the replace's txn marker drives
        // crash resume, so it must land last (a crash in between replays
        // the tombstones as a txn no-op, then completes the replace).
        try {
          GraftSql.mergeTouchedGroups(mv,
            filt(src.readChangeFeed(v0, Some(srcV)))
              .select(groupCols.map(col): _*).distinct(),
            filt(src.readVersion(srcV)), groupCols, aggs, txnApp, srcV)
          "groups"
        } catch {
          case _: CdfNotExpressible => recompute(); "full"
        }
      } else {
        recompute()
        "full"
      }
    // bump on PROPERTY lag, not on mode: a ledger-healed retry whose
    // uncovered tail is empty reads as "noop" but must still repair the
    // stale covered-version property left by the crash
    if (srcV > v0Prop)
      mv.setProperties(Map(GraftSql.MvVersionProp -> srcV.toString))
    // advance the retention floor with the covered version (no-op when
    // already there); a crash before this just retains more until the
    // next refresh
    if (srcHistory.exists(_.version == srcV))
      src.setPin(graft.plans.JoinMv.pinName(mv), srcV)
    if (where.isEmpty) armMvRewrite(src, mv, groupCols, aggs, srcV)
    else graft.plans.MvRewrite.deregisterRoot(mv.root) // defensive: never serve a filtered MV
    Seq((mvIdent, mode, srcV)).toDF("mv", "mode", "source_version")
  }

  /** `(layer.table, properties)` of every warehouse MV whose source is
    * `srcRoot` — the dependency walk DDL guards and re-keying use.
    * Metadata-priced (one properties read per catalog table). */
  private def mvsSourcedFrom(srcRoot: String): Seq[(String, Map[String, String])] =
    catalog.toSeq.flatMap(_.tables.flatMap { case (l, t) =>
      val props = catalog.get.table(l, t).properties
      if (props.get(GraftSql.MvSourceProp).contains(srcRoot))
        Some((s"$l.$t", props))
      else None
    })

  /** Join MVs whose fact or one of whose dims is `srcRoot`; the Int
    * flags which side (-1 = fact, else the dim's index) — key-column
    * guards are side-specific. */
  private def joinMvsSourcedFrom(srcRoot: String)
      : Seq[(String, Map[String, String], Int)] =
    catalog.toSeq.flatMap(_.tables.flatMap { case (l, t) =>
      val props = catalog.get.table(l, t).properties
      if (props.get(graft.plans.JoinMv.FactProp).contains(srcRoot))
        Some((s"$l.$t", props, -1))
      else props.get(graft.plans.JoinMv.DimProp)
        .map(_.split(";").indexOf(srcRoot)).filter(_ >= 0)
        .map(i => (s"$l.$t", props, i))
    })

  /** RENAME COLUMN follow-through for JOIN definitions: agg source
    * columns re-key like [[rekeyDependentMvAggs]]. A name match proved
    * the dependency at CREATE time (ambiguity was refused), but a
    * later ADD COLUMN on the OTHER side can recreate the collision —
    * then the agg may actually read the other side's column and a
    * blind re-key would silently re-point it. Refuse that rename: the
    * join output is already ambiguous for the agg, so there is no
    * correct re-key, only a loud one. */
  private def rekeyDependentJoinMvAggs(srcRoot: String, from: String,
                                       to: String): Unit =
    joinMvsSourcedFrom(srcRoot).foreach { case (identMv, props, _) =>
      val aggs = GraftSql.parseAggSpecs(props(graft.plans.JoinMv.AggsProp))
      if (aggs.exists(_._2 == from)) {
        resolve(identMv).setProperties(Map(graft.plans.JoinMv.AggsProp ->
          aggs.map { case (f, c, o) =>
            s"$f:${if (c == from) to else c}:$o"
          }.mkString(";")))
        ()
      }
    }

  /** Pre-commit validation for the above: refuses while the table is
    * still un-renamed, so a refusal never strands a renamed table with
    * a stale definition. */
  private def requireJoinMvRekeyUnambiguous(srcRoot: String,
                                            from: String): Unit =
    joinMvsSourcedFrom(srcRoot).foreach { case (identMv, props, side) =>
      val aggs = GraftSql.parseAggSpecs(props(graft.plans.JoinMv.AggsProp))
      if (aggs.exists(_._2 == from)) {
        val allRoots = props(graft.plans.JoinMv.FactProp) +:
          props(graft.plans.JoinMv.DimProp).split(";").toSeq
        val sideIdx = side + 1 // -1 fact → 0; dim i → i+1
        val otherHas = allRoots.zipWithIndex.exists {
          case (r, i) => i != sideIdx && scala.util.Try(
            VersionedTable(spark, r).read.columns.contains(from))
            .getOrElse(false)
        }
        require(!otherHas,
          s"RENAME COLUMN: `$from` is an agg column of join MV " +
            s"$identMv and ANOTHER join side now carries it too — the " +
            "agg's source side is ambiguous; drop and recreate the MV")
      }
    }

  /** Column names a join MV's dim-side FILTER references (empty when
    * the side is the fact, has no filter, or the stored text fails to
    * parse — the guard then falls back to the loud analysis error at
    * the next refresh rather than blocking unrelated DDL). */
  private def joinMvDimFilterCols(props: Map[String, String],
                                  side: Int): Set[String] =
    if (side < 0) Set.empty
    else props.get(graft.plans.JoinMv.DimFilterProp)
      .map(_.split(";", -1).toSeq).filter(fs => side < fs.length)
      .map(_(side)).filter(_.nonEmpty)
      .map(f => java.net.URLDecoder.decode(f, "UTF-8"))
      .flatMap(f => scala.util.Try(
        spark.sessionState.sqlParser.parseExpression(f).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts.last
        }.toSet).toOption)
      .getOrElse(Set.empty)

  /** Sketch rollups (library-created but catalog-resident) whose
    * source is `srcRoot` — the dependency walk for DDL guards. */
  private def sketchesSourcedFrom(srcRoot: String)
      : Seq[(String, Map[String, String])] =
    catalog.toSeq.flatMap(_.tables.flatMap { case (l, t) =>
      val props = catalog.get.table(l, t).properties
      if (props.get(graft.ops.Sketches.SourceProp).contains(srcRoot))
        Some((s"$l.$t", props))
      else None
    })

  /** RENAME COLUMN follow-through for sketch rollups: the distinct
    * column lives only in the stored definition — re-key it so later
    * refreshes resolve under the new name. */
  private def rekeyDependentSketchDistinct(srcRoot: String, from: String,
                                           to: String): Unit =
    sketchesSourcedFrom(srcRoot).foreach { case (identMv, props) =>
      if (props(graft.ops.Sketches.DistinctProp) == from) {
        resolve(identMv).setProperties(
          Map(graft.ops.Sketches.DistinctProp -> to))
        ()
      }
    }

  /** Source columns an MV definition references (group + agg inputs). */
  private def mvReferencedCols(props: Map[String, String]): Set[String] =
    props(GraftSql.MvGroupProp).split(",").toSet ++
      GraftSql.parseAggSpecs(props(GraftSql.MvAggsProp))
        .map(_._2).filterNot(_ == "*").toSet ++
      mvWhereCols(props)

  /** Columns the table's OWN governance policies reference: masked
    * column names, plus every attribute the row-filter predicate and
    * mask expressions mention — protected from RENAME/DROP like MV
    * predicate columns (policy text cannot be re-keyed safely, and a
    * policy that silently stops applying is a leak). */
  private def governanceCols(t: VersionedTable): Set[String] = {
    val props = t.properties
    def refs(s: String): Set[String] =
      spark.sessionState.sqlParser
        .parseExpression(GraftSql.substPrincipal(s, Some("x"))).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts.last
        }.toSet
    val masked = props.collect {
      case (k, v) if k.startsWith(GraftSql.ColumnMaskPrefix) =>
        Set(k.stripPrefix(GraftSql.ColumnMaskPrefix)) ++ refs(v)
    }.flatten.toSet
    masked ++ props.get(GraftSql.RowFilterProp).map(refs).getOrElse(Set.empty)
  }

  /** Columns a filtered MV's stored predicate references — they must be
    * protected from RENAME/DROP like group columns (the predicate text
    * cannot be re-keyed safely, and an unresolvable predicate would
    * brick every later REFRESH). */
  private def mvWhereCols(props: Map[String, String]): Set[String] =
    props.get(GraftSql.MvWhereProp).map { p =>
      spark.sessionState.sqlParser.parseExpression(p).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.last
      }.toSet
    }.getOrElse(Set.empty)

  /** RENAME COLUMN follow-through: rewrite the `fn:col:out` agg specs of
    * every dependent MV definition from `from` to `to`. Output column
    * names and group columns are untouched (group renames are refused
    * upstream). */
  private def rekeyDependentMvAggs(srcRoot: String, from: String,
                                   to: String): Unit =
    mvsSourcedFrom(srcRoot).foreach { case (identMv, props) =>
      val aggs = GraftSql.parseAggSpecs(props(GraftSql.MvAggsProp))
      if (aggs.exists(_._2 == from)) {
        resolve(identMv).setProperties(Map(GraftSql.MvAggsProp ->
          aggs.map { case (f, c, o) =>
            s"$f:${if (c == from) to else c}:$o"
          }.mkString(";")))
        ()
      }
    }

  /** Re-arm routing for every materialized view registered in the
    * warehouse whose covered version still equals its source's head —
    * the process-restart recovery path (the rewrite registry is
    * in-memory; the definitions are not), callable right after catalog
    * open instead of waiting for the first REFRESH. An MV whose source
    * has moved stays un-armed (it is stale — REFRESH catches it up);
    * one whose source vanished is skipped. Metadata-priced per table;
    * only MV-propertied tables build a snapshot. Returns the armed
    * `layer.table` identifiers. */
  def armMaterializedViews(): Seq[String] = {
    val cat = catalog.getOrElse(
      sys.error("armMaterializedViews needs a catalog-backed GraftSql"))
    cat.tables.flatMap { case (l, t) =>
      val mv = cat.table(l, t)
      val props = mv.properties
      props.get(GraftSql.MvSourceProp).flatMap { srcRoot =>
        val src = VersionedTable(spark, srcRoot)
        val covered = props(GraftSql.MvVersionProp).toLong
        val aggSpecs = GraftSql.parseAggSpecs(props(GraftSql.MvAggsProp))
        if (src.exists && src.latestVersion.contains(covered) &&
            !props.contains(GraftSql.MvWhereProp) &&
            !aggSpecs.exists(a => GraftSql.approxAgg(a._1))) {
          armMvRewrite(src, mv,
            props(GraftSql.MvGroupProp).split(",").toSeq, aggSpecs, covered)
          Some(s"$l.$t")
        } else None
      }.orElse(props.get(graft.plans.JoinMv.FactProp).flatMap { factRoot =>
        val fact = VersionedTable(spark, factRoot)
        val dimTs = props(graft.plans.JoinMv.DimProp).split(";").toSeq
          .map(VersionedTable(spark, _))
        val fV = props(graft.plans.JoinMv.FactVersionProp).toLong
        val dVs = props(graft.plans.JoinMv.DimVersionProp)
          .split(";").toSeq.map(_.toLong)
        // only the single-dim shape can arm (the rewrite rule matches
        // two-table joins); multi-dim definitions refresh-only
        if (dimTs.length == 1 && fact.exists &&
            fact.latestVersion.contains(fV) &&
            dimTs.zip(dVs).forall { case (d, v) =>
              d.exists && d.latestVersion.contains(v)
            } &&
            graft.plans.MvRewrite.isRegistrable(fact, Some(fV)) &&
            graft.plans.MvRewrite.isRegistrable(dimTs.head, Some(dVs.head))) {
          graft.plans.JoinMv.arm(spark, mv)
          Some(s"$l.$t")
        } else None
      })
    }
  }

  /** Best-effort: registration covers plain, multi-arm (post-DDL) and
    * DV-bearing snapshots; only a read that decomposes to no
    * recognizable graft scan shape at all skips quietly. The MV itself
    * stays correct and maintained either way. */
  private def armMvRewrite(src: VersionedTable, mv: VersionedTable,
                           groupCols: Seq[String],
                           aggs: Seq[(String, String, String)],
                           srcV: Long): Unit =
    // explicit pre-check, no blanket catch: an unrecognizable snapshot
    // skips quietly (the conservative matcher could never serve it
    // anyway), while a genuinely broken registration — MV missing
    // declared columns, unreadable roots — still surfaces loudly.
    // Registration pins the COVERED version, never the live head (a
    // concurrent commit between the pin and this call must stay
    // un-served).
    if (aggs.exists(a => GraftSql.approxAgg(a._1)))
      // sketch estimates must NEVER transparently replace a query's own
      // aggregate (Spark's approx_count_distinct is a different
      // estimator — results would silently change); and a REPLACE that
      // turned an armed exact MV into a sketch-bearing one must drop
      // the stale registration, not leave it serving
      graft.plans.MvRewrite.deregisterRoot(mv.root)
    else if (graft.plans.MvRewrite.isRegistrable(src, Some(srcV)))
      graft.plans.MvRewrite.register(src, mv, groupCols,
        aggs.map { case (f, c, o) => graft.plans.MvRewrite.AggSpec(f, c, o) },
        atVersion = Some(srcV))

  private def optimize(tbl: VersionedTable, zcols: Option[String]): DataFrame = {
    import spark.implicits._
    val before = tbl.history.lastOption.getOrElse(
      sys.error(s"OPTIMIZE: empty table at ${tbl.root}"))
    // bare OPTIMIZE on a clustered table z-orders by the DECLARED
    // cluster columns (the liquid-clustering contract: declare once,
    // every OPTIMIZE clusters) — explicit ZORDER BY still overrides
    val declared = tbl.properties.get(VersionedTable.ClusterByProp)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val entry = zcols match {
      case Some(cs) =>
        tbl.compactZOrder(cs.split(",").map(_.trim.stripPrefix("`")
          .stripSuffix("`")).filter(_.nonEmpty).toSeq)
      // bucketed guard belongs to the DDL (CLUSTER BY refuses there); a
      // property smuggled onto a bucketed table must not break OPTIMIZE
      case None if declared.isDefined && tbl.bucketSpec.isEmpty =>
        tbl.compactZOrder(declared.get)
      case None if tbl.bucketSpec.isDefined => tbl.compact()
      case None => tbl.compactSmall(spark.conf
        .getOption(SmallFileBytesConf).map(_.toLong)
        .getOrElse(DefaultSmallFileBytes))
    }
    Seq((entry.action, before.version, entry.version,
        before.fileSets.length.toLong, entry.fileSets.length.toLong))
      .toDF("operation", "version_before", "version_after",
        "file_sets_before", "file_sets_after")
  }

  /** `OPTIMIZE … WHERE` — Delta's partition-scoped compaction: only the
    * named partition's cells rewrite, O(one partition) not O(table).
    * The predicate must name exactly the table's partition keys with
    * `=` equalities (anything else cannot map to a partition tuple —
    * fail loudly rather than silently over- or under-compact). */
  private def optimizePartition(tbl: VersionedTable,
                                preds: String): DataFrame = {
    import spark.implicits._
    val before = tbl.history.lastOption.getOrElse(
      sys.error(s"OPTIMIZE: empty table at ${tbl.root}"))
    val partKeys = tbl.bucketSpec.map(_.partitionKeys).getOrElse(Nil)
    require(partKeys.nonEmpty,
      s"OPTIMIZE … WHERE needs a partitioned bucketed table at ${tbl.root}")
    val kvs = preds.split("(?i)\\s+AND\\s+").map { p =>
      p.split("=", 2) match {
        case Array(k, v) =>
          k.trim.stripPrefix("`").stripSuffix("`") ->
            v.trim.stripPrefix("'").stripSuffix("'")
        case _ => sys.error(s"OPTIMIZE WHERE: not an equality: $p")
      }
    }.toMap
    require(kvs.keySet == partKeys.toSet,
      s"OPTIMIZE WHERE must name exactly the partition keys " +
        s"${partKeys.mkString(", ")} (got ${kvs.keys.mkString(", ")})")
    val entry = tbl.compactPartitions(Seq(partKeys.map(kvs)))
    Seq((entry.action, before.version, entry.version,
        before.fileSets.length.toLong, entry.fileSets.length.toLong))
      .toDF("operation", "version_before", "version_after",
        "file_sets_before", "file_sets_after")
  }

  private def restore(tbl: VersionedTable,
                      run: VersionedTable => VersionedTable.LogEntry): DataFrame = {
    import spark.implicits._
    val before = tbl.latestVersion.getOrElse(
      sys.error(s"RESTORE: empty table at ${tbl.root}"))
    val entry = run(tbl)
    Seq((entry.action, before, entry.version))
      .toDF("operation", "version_before", "version_after")
  }

  /** The session clock is pinned UTC (every entry point sets
    * `spark.sql.session.timeZone=UTC`), so RESTORE's timestamp literal
    * parses in UTC too — `Timestamp.valueOf` would silently shift by the
    * JVM default zone. */
  private def parseTsUtc(ts: String): Long = GraftSql.parseTsUtc(ts)

  /** `VACUUM … DRY RUN DETAIL`: the FULL blast radius with per-path
    * status — `reclaimable` (the default VACUUM would delete it) or
    * `pin-held` (only IGNORE PINS would) — naming, PER PATH, every
    * consumer pin whose retained suffix covers it (a pin with floor f
    * holds a path referenced by any version ≥ f, so the path frees only
    * when ALL listed pins drop or advance past its last referencing
    * version), the most-behind listed floor, and the oldest listed
    * pin's last-advanced age in seconds. An operator hunting
    * reclamation reads this instead of diffing two previews by hand; a
    * large `blocking_pin_age_sec` on a never-advancing pin is the
    * abandoned-checkpoint signal. */
  private def vacuumDryRunDetail(tbl: VersionedTable, retain: Int): DataFrame = {
    import spark.implicits._
    require(retain >= 1, s"VACUUM: RETAIN $retain VERSIONS (must be >= 1)")
    // ONE listing pass classifies both views — two separate dry-run
    // calls could skew (a file crossing the staging grace window or a
    // concurrent commit between them) and mislabel a path pin-held
    val classified = tbl.vacuumDryRunClassified(retainVersions = retain)
    val pins = tbl.pinsDetail.toSeq.sortBy(_._1)
    val now = System.currentTimeMillis()
    // last version referencing each reclaim-candidate name: the pin-held
    // test per pin P is floor(P) <= maxRef(path)
    val maxRef: Map[String, Long] = tbl.history.flatMap(e =>
        (e.fileSets.map("data/" + _) ++ e.dvs.map("_dv/" + _) ++
          e.cdf.map("_changes/" + _)).map(_ -> e.version))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    classified.map { case (p, isReclaimable) =>
      if (isReclaimable) (p, "reclaimable", null: String,
        None: Option[Long], None: Option[Long])
      else {
        val holders = maxRef.get(p)
          .map(mr => pins.filter(_._2._1 <= mr)).getOrElse(pins)
        (p, "pin-held", holders.map(_._1).mkString(","),
          holders.map(_._2._1).minOption,
          holders.map(_._2._2).minOption.map(ts => (now - ts) / 1000L))
      }
    }.toDF("path", "status", "blocking_pin", "pin_version",
      "blocking_pin_age_sec")
  }

  /** `VACUUM … FORCE EXPIRE PINS OLDER THAN n <unit>`: expire every
    * consumer pin whose floor has not advanced for the interval (dead
    * consumers — a live one re-points every refresh), then run the
    * normal pin-respecting vacuum. One row per expired pin naming it,
    * plus the reclaim count; a no-op expiry returns a single summary
    * row with NULL pin columns — loud, diffable, safe to script. The
    * expiry itself is committed to history (`expire_pins`), so the
    * audit trail survives the vanished pin files. The age bound is
    * floored at 1 HOUR: liveness timestamps are written by consumer
    * clocks (same-version heartbeats every ~60s), so the bound must
    * dominate both the heartbeat period and plausible cross-host
    * clock skew — sane production bounds are hours-to-days. */
  private def vacuumExpirePins(tbl: VersionedTable, retain: Int,
                               n: Long, unit: String): DataFrame = {
    import spark.implicits._
    require(retain >= 1, s"VACUUM: RETAIN $retain VERSIONS (must be >= 1)")
    require(n > 0,
      "VACUUM FORCE EXPIRE PINS: OLDER THAN must be a positive interval")
    val ms = unit.toUpperCase(java.util.Locale.ROOT) match {
      case "MINUTE" => n * 60L * 1000L
      case "HOUR"   => n * 3600L * 1000L
      case "DAY"    => n * 86400L * 1000L
    }
    // Floor at one hour: pin liveness is a wall-clock HEARTBEAT
    // (consumers re-stamp every ~60s while alive), and heartbeat
    // timestamps come from the CONSUMER's clock — a bound comparable
    // to plausible cross-host clock skew would expire consumers that
    // are alive but merely skewed. One hour dwarfs both the heartbeat
    // period and any sanely-NTP'd skew; the operational guidance
    // remains hours-to-days.
    require(ms >= 3600L * 1000L,
      s"VACUUM FORCE EXPIRE PINS: OLDER THAN $n $unit is below the 1 HOUR " +
        "floor — pin timestamps are consumer-clock heartbeats (refreshed " +
        "every ~60s while alive), so a sub-hour bound risks expiring live " +
        "consumers on clock-skewed hosts. Use >= 1 HOURS.")
    val expired = tbl.expirePins(ms)
    val reclaimed = tbl.vacuum(retainVersions = retain).length.toLong
    val rows =
      if (expired.isEmpty)
        Seq((null: String, None: Option[Long], None: Option[Long], 0L,
          reclaimed))
      else expired.map { case (name, v, ageMs) =>
        (name, Some(v), Some(ageMs / 1000L), expired.length.toLong,
          reclaimed)
      }
    rows.toDF("expired_pin", "pin_version", "pin_age_sec", "n_expired",
      "n_reclaimed")
  }

  private def vacuum(tbl: VersionedTable, retain: Int, dryRun: Boolean,
                     respectPins: Boolean = true): DataFrame = {
    import spark.implicits._
    require(retain >= 1, s"VACUUM: RETAIN $retain VERSIONS (must be >= 1)")
    if (dryRun)
      // pin-held paths preview via the IGNORE PINS DRY RUN diff (and
      // SHOW PINS names the consumers) — the default preview keeps its
      // one-column contract and lists exactly what VACUUM would delete
      tbl.vacuumDryRun(retainVersions = retain, respectPins = respectPins)
        .toDF("path").orderBy("path")
    else {
      // one listing: vacuum() reports what it actually deleted, so
      // n_reclaimed can't drift from the deletes under concurrency
      // (and the directory walk + history parse happen once, not twice)
      val deleted = tbl.vacuum(retainVersions = retain,
        respectPins = respectPins)
      Seq(deleted.length.toLong).toDF("n_reclaimed")
    }
  }

  // ------------------------------------------------------------- SQL DML

  /** One-row result every DML statement returns: the committed version
    * and action. Affected-row metrics deliberately are NOT computed here
    * — that would cost an extra full scan per statement at 100 TB; the
    * commit metadata lives in DESCRIBE HISTORY. */
  private def versionDf(e: VersionedTable.LogEntry): DataFrame = {
    import spark.implicits._
    Seq((e.version, e.action)).toDF("version", "action")
  }

  /** SHOW TBLPROPERTIES — Spark's (key, value) relation, key-sorted for
    * determinism. Metadata-only. */
  private def showProps(t: VersionedTable): DataFrame = {
    import spark.implicits._
    t.properties.toSeq.sortBy(_._1).toDF("key", "value")
  }

  /** SHOW PARTITIONS — the distinct partition-column values of the
    * current snapshot, one row each, ordered. The scan prunes to the
    * partition columns (parquet column pruning) and the distinct is a
    * partial-aggregated shuffle over only those low-cardinality values —
    * at 100 TB this moves per-partition counts, not data. */
  private def showPartitions(t: VersionedTable): DataFrame = {
    val parts = t.bucketSpec.map(_.partitionKeys).getOrElse(t.partitionLayout)
    require(parts.nonEmpty,
      s"SHOW PARTITIONS: table at ${t.root} is not partitioned")
    t.read.select(parts.map(col): _*).distinct().orderBy(parts.map(col): _*)
  }

  /** SHOW CREATE TABLE — one `createtab_stmt` row reconstructing the
    * current logical schema and layout as runnable DDL. Delta's shape:
    * identity/generated columns inline, CHECK constraints and the bucket
    * spec folded into TBLPROPERTIES (`graft.constraints.<name>`,
    * `graft.bucket.*` — Delta likewise surfaces constraints as
    * `delta.constraints.*` properties), properties key-sorted. */
  private def showCreate(t: VersionedTable): DataFrame = {
    import spark.implicits._
    val idCols = t.identityColumns
      .map { case (n, s, st) =>
        n -> (s"BIGINT GENERATED ALWAYS AS IDENTITY " +
          s"(START WITH $s INCREMENT BY $st)") }.toMap
    val genCols = t.generatedColumns.toMap
    val dflts = t.defaultColumns.toMap
    val cols = t.read.schema.fields.map { f =>
      idCols.get(f.name).map(d => s"  ${f.name} $d")
        .orElse(genCols.get(f.name).map(e =>
          s"  ${f.name} ${f.dataType.sql} GENERATED ALWAYS AS ($e)"))
        .orElse(dflts.get(f.name).map(e =>
          s"  ${f.name} ${f.dataType.sql} DEFAULT $e"))
        .getOrElse(s"  ${f.name} ${f.dataType.sql}")
    }
    val parts = t.bucketSpec.map(_.partitionKeys).getOrElse(t.partitionLayout)
    val props =
      t.properties.toSeq ++
        t.checks.map { case (n, e) => (s"graft.constraints.$n", e) } ++
        // informational keys ride the same folded-properties shape the
        // CHECK constraints use (Delta's delta.constraints.* analog)
        t.keyConstraints.map { case (n, spec) =>
          (s"graft.keyConstraints.$n", spec) } ++
        t.bucketSpec.toSeq.flatMap(sp => Seq(
          "graft.bucket.keys" -> sp.keys.mkString(","),
          "graft.bucket.num" -> sp.numBuckets.toString)) ++
        (if (t.changeFeedEnabled &&
          !t.properties.contains(VersionedTable.CdfProp))
          Seq(VersionedTable.CdfProp -> "true")
         else Nil)
    val stmtText =
      s"CREATE TABLE graft.`${t.root}` (\n" + cols.mkString(",\n") +
        ")\nUSING graft" +
        (if (parts.nonEmpty) s"\nPARTITIONED BY (${parts.mkString(", ")})"
         else "") +
        (if (props.nonEmpty)
          "\nTBLPROPERTIES (\n" + props.sortBy(_._1)
            .map { case (k, v) => s"  '$k' = '$v'" }.mkString(",\n") + ")"
         else "")
    Seq(stmtText).toDF("createtab_stmt")
  }

  /** CREATE [OR REPLACE] TABLE t (id INT, ...) — the reference smoke
    * test's schema-first DDL (01_environment_smoke_test.py:74-80): an
    * empty overwrite snapshot carrying the declared schema, so a
    * following INSERT aligns positionally against it. */
  private def createEmpty(root: String, orReplace: Boolean,
                          colDefs: String,
                          parts: Seq[String] = Nil): DataFrame = {
    val t = VersionedTable(spark, root)
    require(orReplace || !t.exists,
      s"table already exists: $root (use CREATE OR REPLACE TABLE)")
    // `id BIGINT GENERATED ALWAYS AS IDENTITY [(START WITH n INCREMENT
    // BY s)]` — Delta's identity columns: strip the clause from the DDL
    // (Spark's parser doesn't know it), create, then declare. REPLACE
    // resets any previous declarations AND the high-water mark — a
    // replaced table is a fresh table.
    val IdentityDef = ("""(?is)\s*(`[^`]+`|\w+)\s+BIGINT\s+GENERATED\s+""" +
      """ALWAYS\s+AS\s+IDENTITY(?:\s*\(\s*START\s+WITH\s+(-?\d+)\s+""" +
      """INCREMENT\s+BY\s+(-?\d+)\s*\))?\s*""").r
    // `c TYPE GENERATED ALWAYS AS (expr)` — Delta's generated columns in
    // DDL; the write-path contract (compute-if-absent, verify-if-present)
    // lives in VersionedTable.withGeneratedColumns
    val GeneratedDef = ("""(?is)\s*(`[^`]+`|\w+)\s+([A-Za-z0-9_<>,()\s]+?)""" +
      """\s+GENERATED\s+ALWAYS\s+AS\s*\((.+)\)\s*""").r
    // `c TYPE DEFAULT <expr>` — the Spark/Delta DEFAULT clause; stripped
    // from the DDL and declared after create (named INSERTs fill it)
    val DefaultDef = ("""(?is)\s*(`[^`]+`|\w+)\s+([A-Za-z0-9_<>,()\s]+?)""" +
      """\s+DEFAULT\s+(.+?)\s*""").r
    // `c TYPE NOT NULL` — Delta's NOT NULL column constraint: stripped
    // from the DDL and registered as a write-time CHECK (`c IS NOT
    // NULL` evaluates FALSE, not unknown, for a NULL c — so the
    // unknown-passes CHECK semantics still block it). The strip is
    // scanner-based: only a TOP-LEVEL occurrence (outside quotes AND
    // parentheses) is a column constraint — `DECIMAL(10,2) NOT NULL`
    // and `NOT NULL DEFAULT 5` strip, while an `IS NOT NULL` inside a
    // GENERATED/DEFAULT parenthesized expression (or a quoted literal)
    // is expression text and stays
    val ColName = """(?s)\s*(`[^`]+`|\w+).*""".r
    val notNulls = scala.collection.mutable.ArrayBuffer.empty[String]
    val defs = GraftSql.splitTop(colDefs, ',').map { d =>
      stripTopLevelNotNull(d) match {
        case Some(stripped) =>
          d match { case ColName(n) => notNulls += stripTicks(n) }
          stripped
        case None => d
      }
    }
    val idents = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val gens = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val dflts = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val plain = defs.map {
      case IdentityDef(name, start, step) =>
        val n = stripTicks(name)
        idents += ((n, Option(start).map(_.toLong).getOrElse(1L),
          Option(step).map(_.toLong).getOrElse(1L)))
        s"$name BIGINT"
      case GeneratedDef(name, dtype, genExpr) =>
        gens += ((stripTicks(name), genExpr.trim))
        s"$name $dtype"
      case DefaultDef(name, dtype, dexpr) =>
        dflts += ((stripTicks(name), dexpr.trim))
        s"$name $dtype"
      case other => other
    }.mkString(", ")
    // validate EVERYTHING that can refuse BEFORE clearing the surviving
    // table's declarations: a failed CREATE OR REPLACE (bad type, bad
    // partition column, append-only target) must leave the old table's
    // checks/identity/generated/default metadata intact
    require(!(t.exists && t.appendOnly),
      s"CREATE OR REPLACE: table at $root is append-only " +
        "(graft.appendOnly=true)")
    val schema = StructType.fromDDL(plain)
    val unknown = parts.filterNot(schema.fieldNames.contains)
    require(unknown.isEmpty,
      s"PARTITIONED BY names unknown column(s): ${unknown.mkString(",")}")
    t.clearIdentity()
    t.clearGeneratedColumns()
    t.clearDefaults()
    t.clearChecks()
    t.clearProperties()
    val res = versionDf(t.overwrite(spark.createDataFrame(
      java.util.Collections.emptyList[Row](), schema)))
    // layout declared BEFORE data exists (the empty snapshot stays flat
    // so the partition columns remain in the readable schema); every
    // later INSERT appends hive-layout file-sets against this record
    if (parts.nonEmpty) t.declarePartitionLayout(parts)
    idents.foreach { case (n, st, sp) => t.declareIdentity(n, st, sp) }
    gens.foreach { case (n, e) => t.addGeneratedColumn(n, e) }
    dflts.foreach { case (n, e) => t.setDefault(n, e) }
    notNulls.foreach(c => t.addCheck(s"${c}_not_null", s"$c IS NOT NULL"))
    res
  }

  /** CREATE [OR REPLACE] TABLE t [PARTITIONED BY (...)] AS query. */
  private def ctas(root: String, orReplace: Boolean, parts: Seq[String],
                   query: String): DataFrame = {
    val t = VersionedTable(spark, root)
    require(orReplace || !t.exists,
      s"table already exists: $root (use CREATE OR REPLACE TABLE)")
    // refuse/analyze BEFORE clearing: an append-only target or a query
    // that fails analysis must leave the surviving table's declarations
    // intact (a failed REPLACE may not strip constraints)
    require(!(t.exists && t.appendOnly),
      s"CREATE OR REPLACE: table at $root is append-only " +
        "(graft.appendOnly=true)")
    val df = spark.sql(query) // analysis errors throw here
    // a REPLACEd table is a fresh table: previous identity/generated/
    // default/check/property declarations do not survive
    t.clearIdentity()
    t.clearGeneratedColumns()
    t.clearDefaults()
    t.clearChecks()
    t.clearProperties()
    versionDf(t.overwrite(df, partitionBy = parts))
  }

  // --------------------------------------------------------- governance

  /** Funnel-level UC-style enforcement (resources/uc/grants.sql): active
    * only when the session sets `spark.graft.principal` AND the bound
    * warehouse's grants ledger is non-empty — an unset principal is the
    * owner, and an empty ledger is the reference's "minimal solo
    * default" (grants.sql:14-17 ships every section commented out).
    * Classification is by statement head: mutating heads require MODIFY
    * on the statement's first catalog `layer.table` identifier (its
    * target) and SELECT on the rest (its sources — the INSERT…SELECT /
    * MERGE…USING shape); reading heads require SELECT on every one.
    * Each requirement is conjunctive with USE CATALOG + USE SCHEMA per
    * [[Catalog.authorized]]. GRANT/REVOKE are owner-only; SHOW GRANTS
    * is open (a principal may inspect the ledger it is subject to).
    * Scope: the statements this funnel owns — ad-hoc `spark.sql` over
    * registered temp views is session-level and not re-checked, the
    * boundary Spark itself draws absent a cluster authz service.
    * Backtick-quoted catalog names (``SELECT * FROM `silver_orders` ``)
    * resolve identically to bare ones and ARE charged; only the
    * path-addressed ``graft.`/path` `` form stays outside the catalog
    * namespace the ledger governs.
    * Creation of NEW objects is ungoverned (the model has no CREATE
    * privilege, mirroring the reference template's grant set) — only
    * EXISTING tables are protected. */
  private def checkGrants(stmt0: String): Unit = (catalog,
      spark.conf.getOption(GraftSql.PrincipalConf)) match {
    case (Some(cat), Some(principal)) =>
      val ledger = cat.grants // ONE ledger read per governed statement
      if (ledger.isEmpty) return
      // head anchors must see the real first keyword, not a `--` comment
      val stmt = stripLineComments(stmt0)
      stmt match {
        case GraftSql.ShowGrantsHead() => // open to all principals
        case GraftSql.GrantAdminHead(verb) =>
          sys.error(s"PERMISSION_DENIED: $verb is owner-only " +
            s"(session principal `$principal` — unset ${GraftSql.PrincipalConf} " +
            "to administer grants)")
        case GraftSql.UndropHead() =>
          // charge MODIFY on the named object WITHOUT the existence
          // filter: the target is in the trash by definition, and an
          // ungoverned UNDROP would let any principal resurrect (and
          // then read) a governed table's dropped data
          val scanStmt = GraftSql.untickWordNames(stmt)
          val mask = GraftSql.stringLiteralMask(scanStmt)
          GraftSql.IdentToken.findAllMatchIn(scanStmt)
            .filter(m => !mask(m.start))
            .flatMap(m => m.matched.split("[._]", 2) match {
              case Array(l, t) if cat.Layers.contains(l.toLowerCase) =>
                Some((l.toLowerCase, t))
              case _ => None
            })
            .toSeq.distinct.foreach { case (l, t) =>
              if (!cat.authorized(principal, "MODIFY", l, t, ledger))
                sys.error(s"PERMISSION_DENIED: principal `$principal` " +
                  s"lacks MODIFY on $l.$t")
            }
        case _ =>
          // CREATE VIEW / CREATE MV read their sources; the view object
          // itself is a NEW object (creation is ungoverned) — without
          // this, the first named source would be charged MODIFY, and a
          // MODIFY-only principal could launder reads through a view
          val head = {
            // anchor the head PAST leading parens: `(SELECT …) UNION …`
            // and `((SELECT …))` read tables exactly like their bare
            // forms and must classify, not slip every head regex
            val anchored = stmt.dropWhile(c => c.isWhitespace || c == '(')
            if (GraftSql.CreateViewHead.pattern.matcher(anchored).matches())
              "SELECT"
            else if (GraftSql.ModifyHead.pattern.matcher(anchored).matches())
              "MODIFY"
            else if (GraftSql.ReadHead.pattern.matcher(anchored).matches())
              "SELECT"
            else return
          }
          // the scan accepts what the RESOLVER accepts: dotted or
          // underscore layer separators, any layer case (targetRoot
          // lowercases); literal-masked so data naming a table is not a
          // reference. Position decides the action BEFORE existence
          // filtering: in `CREATE MV gold.mv AS … FROM silver.src` the
          // not-yet-existing target still occupies the target slot, so
          // the source is charged SELECT, not MODIFY.
          // Spark resolves backtick-quoted word-shaped names identically
          // to bare ones (`silver_orders`, `Silver`.`gov`): strip those
          // ticks FIRST so the one scan below sees every spelling. Path
          // bodies (``graft.`/p` ``) aren't word-shaped, keep their
          // ticks, and stay masked; a word-shaped body after `graft.`
          // untickes into a graft.x token whose maximal munch fails the
          // layer split (graft is not a layer) — still out of scope.
          val scanStmt = GraftSql.untickWordNames(stmt)
          val mask = GraftSql.stringLiteralMask(scanStmt)
          val named = GraftSql.IdentToken.findAllMatchIn(scanStmt)
            .filter(m => !mask(m.start))
            // split each WHOLE token exactly as the resolver does
            // (splitLayerName: first [._], layer lowercased) — an
            // independent regex split would disagree on names like
            // gold_dim_player (resolver: gold/dim_player; a greedy
            // last-separator split: gold_dim/player → unchecked)
            .flatMap(m => m.matched.split("[._]", 2) match {
              case Array(l, t) if cat.Layers.contains(l.toLowerCase) =>
                Some((l.toLowerCase, t))
              case _ => None
            })
            .toSeq.distinct
          named.zipWithIndex.foreach { case ((l, t), i) =>
            val action = if (head == "MODIFY" && i > 0) "SELECT" else head
            // COMMENT ON COLUMN names `layer.table.column` — when the
            // first-split "table" (`cm.k`) does not exist, retry the
            // leading segment so the real table is still charged
            val target =
              if (cat.table(l, t).exists) Some(t)
              else t.split("[._]").headOption
                .filter(h => h != t && cat.table(l, h).exists)
            target.foreach { t2 =>
              if (!cat.authorized(principal, action, l, t2, ledger))
                sys.error(s"PERMISSION_DENIED: principal `$principal` " +
                  s"lacks $action on $l.$t2")
            }
          }
      }
    case _ => // owner session or no catalog: everything is authorized
  }

  /** Normalize a grant object name: the reference qualifies with the
    * catalog (`football.bronze`, `football.gold.dim_player`) — one
    * warehouse here, so SCHEMA keeps the last segment and TABLE the
    * last two; CATALOG's name is recorded as given (informational). */
  private def normalizeGrantObj(otype: String, oname: String): String = {
    val parts = stripTicks(oname).split("\\.")
    otype match {
      case "SCHEMA" => parts.last
      case "TABLE" =>
        require(parts.length >= 2,
          s"TABLE grants take layer.table names (got $oname)")
        parts.takeRight(2).mkString(".")
      case _ => stripTicks(oname)
    }
  }

  private def splitPrivs(privs: String): Seq[String] =
    privs.split(",").toSeq.map(_.trim.toUpperCase
      .replaceAll("\\s+", " ")).filter(_.nonEmpty)

  private def grantsDf(rows: Seq[(String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (p, t, o, g) => (g, p, t, o) }.sorted
      .toDF("principal", "privilege", "object_type", "object")
  }

  /** A graft table for a DML statement's identifier, or None when the
    * statement isn't ours and must delegate (the ANALYZE pattern). */
  private def owned(ident: String): Option[VersionedTable] =
    scala.util.Try(resolve(ident)).toOption

  private def ownedRoot(ident: String): Option[String] =
    scala.util.Try(targetRoot(ident)).toOption

  /** ALTER TABLE … RENAME TO … : ONE directory rename moves the whole
    * table — log, data, sidecars, constraint/property/identity ledgers
    * all live under the root, so nothing is rewritten and old versions
    * stay readable at the new path. On a local/HDFS filesystem this is a
    * metadata-only atomic move; on an object store a directory "rename"
    * degrades to O(files) copies — there the metastore-level re-point
    * (name → same path) is the right tool, as in Delta. Catalog-bound
    * idents also re-point the `<layer>_<table>` temp views. */
  private def renameTable(srcIdent: String, srcRoot: String,
                          dstIdent: String, dstRoot: String): DataFrame = {
    import spark.implicits._
    import java.nio.file.{Files, Paths, StandardCopyOption}
    require(VersionedTable(spark, srcRoot).exists,
      s"table not found: $srcIdent")
    require(!VersionedTable(spark, dstRoot).exists,
      s"RENAME TO target already exists: $dstIdent")
    val from = Paths.get(srcRoot)
    val to = Paths.get(dstRoot)
    require(!Files.exists(to),
      s"RENAME TO target path is occupied: $dstRoot")
    Option(to.getParent).foreach(Files.createDirectories(_))
    // an armed materialized view keyed by this root must un-arm before
    // the directory moves away, or the routing rule would serve queries
    // from a dead path (same guard DROP TABLE has); REFRESH re-arms
    // under the new root
    graft.plans.MvRewrite.deregisterRoot(srcRoot)
    try Files.move(from, to, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      // cross-device: a directory tree cannot be moved atomically (and
      // java.nio's plain move refuses non-empty directories outright) —
      // refuse with guidance rather than fail half-moved
      sys.error(s"RENAME TO: $srcRoot and $dstRoot are on different " +
        "filesystems — a table directory cannot move atomically across " +
        "mounts. Use CREATE TABLE … SHALLOW CLONE to the new location " +
        "(zero-copy on the same mount) or copy the directory externally.")
    }
    // temp views registered for the old name now dangle — drop them and
    // re-register the warehouse (idempotent; picks up the new name)
    catalog.foreach { cat =>
      splitLayerName(cat, srcIdent).foreach { case (l, n) =>
        spark.catalog.dropTempView(s"${l}_$n")
        spark.catalog.dropTempView(s"${l}_${n}_history")
      }
      cat.registerViews()
    }
    Seq((srcIdent, dstIdent)).toDF("renamed_from", "renamed_to")
  }

  /** `layer.name` / `layer_name` split against the bound catalog's
    * layers; None for explicit-path idents and foreign names. */
  private def splitLayerName(cat: Catalog,
                             ident: String): Option[(String, String)] =
    ident match {
      case PathIdent(_) => None
      case other => other.split("[._]", 2) match {
        case Array(l, n) if cat.Layers.contains(l.toLowerCase) =>
          Some((l.toLowerCase, n))
        case _ => None
      }
    }

  /** DROP TABLE [IF EXISTS] for catalog identifiers (reference smoke
    * flow, 01_environment_smoke_test.py:93); path idents and non-graft
    * names are not ours — None delegates (dropping an explicit-path
    * table is `rm -r`, not a statement's job). */
  private def dropOwned(ident: String, ifExists: Boolean): Option[DataFrame] = {
    import spark.implicits._
    ident match {
      case PathIdent(_) => None
      case other => catalog.flatMap { cat =>
        other.split("[._]", 2) match {
          case Array(layer, name) if cat.Layers.contains(layer.toLowerCase) =>
            val t = cat.table(layer.toLowerCase, name)
            if (!t.exists && !ifExists) sys.error(s"table not found: $other")
            // an armed materialized view must un-arm before its files go
            graft.plans.MvRewrite.deregisterRoot(t.root)
            // … and release its retention pins on the sources, or the
            // dropped consumer would hold vacuum back forever (UNDROP
            // note: pins are NOT restored — the next REFRESH re-advances
            // them, degrading to a full recompute if retention ran in
            // between)
            if (t.exists) {
              graft.plans.JoinMv.dropPins(spark, t)
              val props = t.properties
              Seq(GraftSql.MvSourceProp, graft.ops.Sketches.SourceProp,
                  graft.ops.Sketches.FreqSourceProp,
                  graft.ops.Sketches.QuantSourceProp)
                .flatMap(props.get).distinct.foreach { srcRoot =>
                  try VersionedTable(spark, srcRoot)
                    .dropPin(graft.plans.JoinMv.pinName(t))
                  catch { case scala.util.control.NonFatal(_) => () }
                }
            }
            cat.dropTable(layer.toLowerCase, name)
            Some(Seq(other).toDF("dropped"))
          case _ => None
        }
      }
    }
  }

  /** UNDROP TABLE <layer.table> — restore the newest trash entry
    * (Databricks UNDROP): one atomic rename back, history/constraints/
    * time travel intact. Catalog identifiers only — a dropped
    * explicit-path table was never catalog-managed. */
  private def undropOwned(ident: String): DataFrame = {
    import spark.implicits._
    val cat = catalog.getOrElse(
      sys.error("UNDROP TABLE needs a catalog-bound GraftSql"))
    ident.split("[._]", 2) match {
      case Array(layer, name) if cat.Layers.contains(layer.toLowerCase) =>
        cat.undropTable(layer.toLowerCase, name)
        Seq(ident).toDF("undropped")
      case _ => sys.error(s"UNDROP TABLE: not a catalog table: $ident")
    }
  }

  /** INSERT INTO appends (bucket-split on merge-bucketed tables so later
    * MERGEs stay copy-on-write; hive layout preserved so pruning
    * survives); INSERT OVERWRITE replaces the snapshot. Standard SQL
    * positional semantics: the query's columns map to the table's by
    * position and cast to its declared types. */
  private def insert(tbl: VersionedTable, overwrite: Boolean,
                     query: String,
                     colList: Option[Seq[String]] = None): DataFrame = {
    val df = spark.sql(query)
    if (colList.isDefined) {
      // named-column form: the query's columns bind POSITIONALLY to the
      // listed names; unlisted columns land as typed NULLs — except
      // identity (stamped by the write path; naming one is refused) and
      // generated columns (compute-if-absent), which stay ABSENT here
      val names = colList.get
      val schemaByName = tbl.read.schema.fields.map(f => f.name -> f).toMap
      val idCols = tbl.identityColumns.map(_._1).toSet
      val genCols = tbl.generatedColumns.map(_._1).toSet
      val unknown = names.filterNot(schemaByName.contains)
      require(unknown.isEmpty,
        s"INSERT: unknown column(s) ${unknown.mkString(",")} at ${tbl.root}")
      require(names.distinct.length == names.length,
        s"INSERT: duplicate column in list: ${names.mkString(",")}")
      val namedIdent = names.filter(idCols.contains)
      require(namedIdent.isEmpty,
        s"INSERT: identity column(s) ${namedIdent.mkString(",")} are " +
          "GENERATED ALWAYS — omit them")
      require(df.columns.length == names.length,
        s"INSERT: query has ${df.columns.length} columns, list names " +
          s"${names.length}")
      val listed = names.toSet
      val dflts = tbl.defaultColumns.toMap
      val projected = tbl.read.schema.fields.toSeq
        .filterNot(f => idCols.contains(f.name))
        .filterNot(f => genCols.contains(f.name) && !listed.contains(f.name))
        .map { f =>
          if (listed.contains(f.name)) col(s"`${f.name}`").cast(f.dataType)
          // unlisted + DEFAULT declared → the default (constant-folded);
          // unlisted otherwise → typed NULL
          else dflts.get(f.name)
            .map(e => expr(e).cast(f.dataType).as(f.name))
            .getOrElse(lit(null).cast(f.dataType).as(f.name))
        }
      val aligned = df.toDF(names.toIndexedSeq: _*).select(projected: _*)
      val parts = tbl.bucketSpec.map(_.partitionKeys)
        .getOrElse(tbl.partitionLayout)
      return versionDf(
        if (overwrite) tbl.overwrite(aligned, partitionBy = parts)
        else tbl.append(aligned, partitionBy = parts))
    }
    val aligned = alignPositional(tbl, df)
    val parts = tbl.bucketSpec.map(_.partitionKeys).getOrElse(tbl.partitionLayout)
    versionDf(if (overwrite) tbl.overwrite(aligned, partitionBy = parts)
              else tbl.append(aligned, partitionBy = parts))
  }

  /** `INSERT INTO t REPLACE WHERE cond <query>` routing (Databricks'
    * replaceWhere surface): a range- or equality-shaped predicate over
    * one column takes the file-pruned [[VersionedTable.replaceRange]]
    * path — untouched file-sets are carried verbatim, the 100 TB
    * partition-backfill shape — anything else is a full COW
    * [[VersionedTable.replaceWhere]]. */
  private def routeReplace(t: VersionedTable, cond: String,
                           df: DataFrame): VersionedTable.LogEntry =
    parseRangePred(cond) match {
      case Some((rc, lo, hi)) => t.replaceRange(rc, lo, hi, df)
      case None               => t.replaceWhere(expr(cond), df)
    }

  /** Positional bind + cast of a query result to `tbl`'s schema.
    * GENERATED ALWAYS AS IDENTITY columns are never supplied: the
    * alignment targets the schema WITHOUT them, and the write path
    * stamps the values. Generated columns MAY be omitted
    * (compute-if-absent) or supplied (verified) — the alignment picks
    * whichever schema the query's column count matches. */
  private def alignPositional(tbl: VersionedTable,
                              df: DataFrame): DataFrame = {
    val idCols = tbl.identityColumns.map(_._1).toSet
    val genCols = tbl.generatedColumns.map(_._1).toSet
    val full = tbl.read.schema.fields.filterNot(f => idCols.contains(f.name))
    val reduced = full.filterNot(f => genCols.contains(f.name))
    val fields =
      if (df.columns.length == full.length || genCols.isEmpty) full
      else reduced
    require(df.columns.length == fields.length,
      s"INSERT: query has ${df.columns.length} columns, " +
        s"table ${tbl.root} expects ${full.length}" +
        (if (genCols.nonEmpty) s" (or ${reduced.length} letting generated " +
          s"${genCols.mkString(",")} compute)" else "") +
        (if (idCols.isEmpty) ""
         else s" (identity ${idCols.mkString(",")} auto-assigns)"))
    df.toDF(fields.map(_.name).toIndexedSeq: _*)
      .select(fields.map(f =>
        col(s"`${f.name}`").cast(f.dataType)).toIndexedSeq: _*)
  }

  /** COPY INTO — idempotent batch file ingest (the batch sibling of the
    * reference's Auto Loader landing-folder flow, docs/architecture.md:
    * 61,121, docs/backlog.md:70-71, and Databricks' COPY INTO): each
    * source file loads exactly once, reruns pick up only new files.
    * Loaded-file state lives in a nested ledger table
    * (`<root>/_copy_ledger` — outside vacuum's walk, reset by CLONE like
    * the txn ledger), and the load is exactly-once by an intent-first
    * two-phase protocol:
    *   1. RECOVER: a ledger intent whose data batch never landed (crash
    *      between the two appends) replays from the ledger's own record
    *      — the pending file list is `readAddedBetween` on the ledger,
    *      the data append idempotent via txn (appId, ledgerVersion);
    *   2. INTENT: the fresh file list appends to the ledger first;
    *   3. DATA: the files load in one append carrying the same txn.
    * A replayed step at any crash point is a metadata no-op. File
    * listing is driver-side, like Spark's own FileIndex — O(files)
    * metadata, not data. Single COPY INTO writer per table at a time
    * (concurrent racers could double-record an intent; same contract as
    * a streaming query owning its checkpoint). */
  private def copyInto(tbl: VersionedTable, srcDir: String,
                       fmt: String): DataFrame = {
    import spark.implicits._
    val ledger = VersionedTable(spark, tbl.root + "/_copy_ledger")
    val appId = s"graft-copy-into:${tbl.root}"
    val parts = tbl.bucketSpec.map(_.partitionKeys).getOrElse(tbl.partitionLayout)

    def aligned(df: DataFrame): DataFrame =
      if (!tbl.exists) df
      else {
        val schema = tbl.read.schema
        val missing = schema.fieldNames.filterNot(df.columns.contains)
        require(missing.isEmpty,
          s"COPY INTO: source files lack column(s) ${missing.mkString(",")}")
        df.select(schema.fields.map(f =>
          col(s"`${f.name}`").cast(f.dataType)).toIndexedSeq: _*)
      }
    def load(paths: Seq[String], txnV: Long): Unit =
      tbl.append(aligned(readFiles(paths, fmt)), partitionBy = parts,
        txn = Some((appId, txnV)))

    // 1. recover a half-applied batch
    ledger.latestVersion.foreach { ledgerV =>
      val dataV = tbl.lastTxnVersion(appId).getOrElse(-1L)
      if (dataV < ledgerV) {
        val pending = ledger.readAddedBetween(dataV, ledgerV)
          .select("source_path").as[String].collect().toSeq.sorted
        load(pending, ledgerV)
      }
    }
    // 2+3. fresh files: intent, then data. The already-loaded set is
    // NOT materialized on the driver — the ledger grows with every file
    // ever loaded (millions for a long-lived landing zone), so the
    // dedup is a left-anti join of this listing against the ledger
    // relation (Delta's COPY INTO does the same against its metadata);
    // only the per-batch FRESH tail, bounded by arrival rate, comes
    // back to the driver to drive the actual file read.
    val listed = listFiles(srcDir)
    val fresh: Seq[String] =
      if (ledger.exists)
        listed.toDF("source_path")
          .join(ledger.read.select("source_path"), Seq("source_path"), "left_anti")
          .as[String].collect().toSeq.sorted
      else listed
    if (fresh.nonEmpty) {
      val intent = ledger.append(fresh.toDF("source_path"))
      load(fresh, intent.version)
    }
    Seq(fresh.size.toLong).toDF("n_files_loaded")
  }

  private def readFiles(paths: Seq[String], fmt: String): DataFrame =
    fmt.toLowerCase match {
      case "parquet" => spark.read.parquet(paths: _*)
      case "json"    => spark.read.json(paths: _*)
      case "csv"     => spark.read.option("header", "true")
        .option("inferSchema", "true").csv(paths: _*)
      case other => sys.error(s"COPY INTO: FILEFORMAT $other not supported " +
        "(PARQUET, JSON, CSV)")
    }

  /** MERGE INTO t USING src ON t.k = s.k [AND ...] — the backlog's
    * "MERGE pattern (idempotent upsert)" (docs/backlog.md:49-51,77) as a
    * statement. Two clause shapes, each mapping to a single engine
    * primitive so the plan is exactly the hand-written one:
    *   UPDATE SET * + INSERT *  →  [[VersionedTable.merge]] (bucket-COW
    *     upsert: only touched (partition, bucket) cells rewrite);
    *   INSERT * alone           →  insert-if-absent: one left-anti join
    *     against the target keys, then an O(new data) append.
    * Row-level SET expressions belong to UPDATE (they'd force a
    * whole-row join plan merge doesn't need); refused explicitly. */
  private def mergeInto(tbl: VersionedTable, tAlias: String, src: String,
                        sAlias: String, on: String,
                        clauses: String): DataFrame = {
    val EqPat = """(?s)\s*(\w+)\.(`[^`]+`|\w+)\s*=\s*(\w+)\.(`[^`]+`|\w+)\s*""".r
    val keyPairs = on.split("(?i)\\s+AND\\s+").toSeq.map {
      case EqPat(a1, c1, a2, c2) =>
        if (a1 == tAlias && a2 == sAlias) (stripTicks(c1), stripTicks(c2))
        else if (a1 == sAlias && a2 == tAlias) (stripTicks(c2), stripTicks(c1))
        else sys.error(s"MERGE ON: aliases must be $tAlias/$sAlias: $on")
      case other =>
        sys.error(s"MERGE ON supports conjunctions of t.k = s.k, got: $other")
    }
    val srcDf = sourceDf(src)
    val renamed = keyPairs.foldLeft(srcDf) { case (d, (tk, sk)) =>
      if (tk == sk) d else d.withColumnRenamed(sk, tk)
    }
    val keys = keyPairs.map(_._1)
    clauses match {
      case UpsertClauses() => versionDf(tbl.merge(renamed, keys))
      case InsertOnlyClauses() =>
        val fresh = graft.ops.Keyed.notIn(renamed, tbl.read, keys)
        val parts = tbl.bucketSpec.map(_.partitionKeys)
          .getOrElse(tbl.partitionLayout)
        versionDf(tbl.append(fresh, partitionBy = parts))
      case DeleteClauses() =>
        // WHEN MATCHED THEN DELETE alone (Delta's delete-by-source
        // shape): every source key becomes a merge tombstone — matched
        // target rows are removed through the same bucket-COW path an
        // upsert takes (only touched cells rewrite); unmatched source
        // keys are no-ops. Keys route the tombstone; on a PARTITIONED
        // merge table the partition columns must ride too (they pick
        // the cell) — carried when the source has them, and their
        // absence fails the staging write loudly, exactly as it would
        // for an upsert without them.
        val parts = tbl.bucketSpec.map(_.partitionKeys).getOrElse(Nil)
        val keep = (keys ++ parts.filter(renamed.columns.contains)).distinct
        versionDf(tbl.merge(
          renamed.select(keep.map(col): _*)
            .withColumn(graft.ops.Merge.DeleteCol, lit(true)),
          keys))
      case other =>
        // the general grammar: conditional / column-level clauses, any
        // number, first-match per row — parsed here, evaluated by
        // Merge.applyClausesWithLineage through the same bucket-COW path
        val cl = parseMergeClauses(other, tAlias, sAlias, keyPairs)
        versionDf(tbl.merge(renamed, keys, clauses = Some(cl)))
    }
  }

  /** Delta's full MERGE clause surface (beyond the three fast-path
    * shapes above):
    *   WHEN MATCHED [AND cond] THEN UPDATE SET (* | c = expr, …) | DELETE
    *   WHEN NOT MATCHED [BY TARGET] [AND cond] THEN
    *     INSERT (* | (cols) VALUES (exprs))
    *   WHEN NOT MATCHED BY SOURCE [AND cond] THEN
    *     UPDATE SET c = expr, … | DELETE
    * Conditions/values are SQL referencing `tAlias.c` / `sAlias.c`
    * (unqualified references fail analysis — loud, not ambiguous).
    * Source key references are rewritten to the target key names the
    * source frame was renamed to (`ON t.k = s.sk` makes `s.sk` mean the
    * renamed column). */
  private def parseMergeClauses(text: String, tAlias: String, sAlias: String,
      keyPairs: Seq[(String, String)]): graft.ops.Merge.Clauses = {
    import graft.ops.Merge._
    def fixKeys(t0: String): String =
      keyPairs.filter(p => p._1 != p._2).foldLeft(t0) { case (acc, (tk, sk)) =>
        // literal-gated like Merge.bind: `s.src_id` inside a quoted
        // string is data and must survive verbatim (mask recomputed per
        // fold step — earlier steps may have changed offsets)
        val mask = GraftSql.stringLiteralMask(acc)
        ("(?i)\\b" + java.util.regex.Pattern.quote(sAlias) +
          "\\s*\\.\\s*(`" + java.util.regex.Pattern.quote(sk) + "`|" +
          java.util.regex.Pattern.quote(sk) + "\\b)").r
          .replaceAllIn(acc, m =>
            if (mask(m.start))
              java.util.regex.Matcher.quoteReplacement(m.matched)
            else java.util.regex.Matcher.quoteReplacement(s"$sAlias.`$tk`"))
      }
    def parseSetTexts(sets: String): Seq[(String, String)] =
      GraftSql.splitTop(sets, ',').map { a =>
        val i = GraftSql.topLevelIndexOf(a, '=')
        require(i > 0, s"MERGE UPDATE SET: not an assignment: $a")
        val lhsRaw = a.substring(0, i).trim
        val lhs = stripTicks(
          if (lhsRaw.toLowerCase.startsWith(tAlias.toLowerCase + "."))
            lhsRaw.substring(tAlias.length + 1).trim
          else lhsRaw)
        lhs -> fixKeys(a.substring(i + 1).trim)
      }
    val MatchedHead = """(?is)\s*MATCHED(?:\s+AND\s+(.+?))?\s*""".r
    val BySourceHead =
      """(?is)\s*NOT\s+MATCHED\s+BY\s+SOURCE(?:\s+AND\s+(.+?))?\s*""".r
    val NotMatchedHead =
      """(?is)\s*NOT\s+MATCHED(?:\s+BY\s+TARGET)?(?:\s+AND\s+(.+?))?\s*""".r
    val UpdateAllAct = """(?is)\s*UPDATE\s+SET\s+\*\s*""".r
    val UpdateSetAct = """(?is)\s*UPDATE\s+SET\s+(.+?)\s*""".r
    val DeleteAct = """(?is)\s*DELETE\s*""".r
    val InsertAllAct = """(?is)\s*INSERT\s+\*\s*""".r
    val InsertValsAct =
      """(?is)\s*INSERT\s*\((.+?)\)\s*VALUES\s*\((.+)\)\s*""".r
    def updateOrDelete(act: String, what: String): MergeAction = act match {
      case UpdateAllAct()     => UpdateAll
      case DeleteAct()        => DeleteRow
      case UpdateSetAct(sets) => UpdateSet(parseSetTexts(sets))
      case other => sys.error(s"$what expects UPDATE SET …|DELETE: $other")
    }
    val idxs = GraftSql.topKeywordIndices(text, "WHEN")
    require(idxs.nonEmpty && text.substring(0, idxs.head).trim.isEmpty,
      s"MERGE clauses must be WHEN …: $text")
    val bounds = idxs :+ text.length
    val matched = scala.collection.mutable.ArrayBuffer.empty[MatchedClause]
    val notMatched = scala.collection.mutable.ArrayBuffer.empty[NotMatchedClause]
    val bySource = scala.collection.mutable.ArrayBuffer.empty[BySourceClause]
    idxs.indices.foreach { i =>
      val chunk = text.substring(idxs(i) + "WHEN".length, bounds(i + 1))
      val thenAt = GraftSql.topKeywordIndices(chunk, "THEN")
      require(thenAt.nonEmpty, s"MERGE clause lacks THEN: WHEN $chunk")
      val head = chunk.substring(0, thenAt.head)
      val act = chunk.substring(thenAt.head + "THEN".length)
      head match {
        case BySourceHead(cond) =>
          bySource += BySourceClause(Option(cond).map(fixKeys),
            updateOrDelete(act, "WHEN NOT MATCHED BY SOURCE"))
        case MatchedHead(cond) =>
          matched += MatchedClause(Option(cond).map(fixKeys),
            updateOrDelete(act, "WHEN MATCHED"))
        case NotMatchedHead(cond) =>
          val action = act match {
            case InsertAllAct() => InsertAll
            case InsertValsAct(cols, vals) =>
              val cs = GraftSql.splitTop(cols, ',').map(stripTicks)
              val vs = GraftSql.splitTop(vals, ',').map(fixKeys)
              InsertValues(cs, vs)
            case other =>
              sys.error(s"WHEN NOT MATCHED expects INSERT …: $other")
          }
          notMatched += NotMatchedClause(Option(cond).map(fixKeys), action)
        case other => sys.error(s"unparseable MERGE clause: WHEN $other")
      }
    }
    Clauses(tAlias, sAlias, matched.toSeq, notMatched.toSeq, bySource.toSeq)
  }

  /** MERGE source: a parenthesized subquery, a graft table, or any
    * relation `spark.sql` can see (temp views included). */
  private def sourceDf(src: String): DataFrame = {
    val s = src.trim
    if (s.startsWith("(")) {
      require(s.endsWith(")") && balanced(s), s"MERGE USING subquery " +
        s"mis-parsed (an ON inside it? alias it as a temp view): $s")
      spark.sql(s.substring(1, s.length - 1))
    } else s match {
      case PathIdent(path) => VersionedTable(spark, path).read
      case name =>
        scala.util.Try(resolve(name).read).getOrElse(spark.table(name))
    }
  }

  private def parseAssignments(sets: String): Map[String, Column] =
    splitTop(sets, ',').map { a =>
      val i = topLevelIndexOf(a, '=')
      require(i > 0, s"UPDATE SET: not an assignment: $a")
      stripTicks(a.substring(0, i).trim) -> expr(a.substring(i + 1).trim)
    }.toMap

  /** The ONE identifier grammar: `layer.table` / `layer_table` via the
    * catalog, or ``graft.`path` `` opening the path directly (Delta's
    * ``delta.`path` `` form). Returns the table's root path without an
    * existence check — a clone/convert TARGET doesn't exist yet (and
    * [[VersionedTable.shallowCloneTo]]/[[VersionedTable.convertFrom]]
    * themselves refuse an already-versioned target). */
  private def targetRoot(ident: String): String = ident match {
    case PathIdent(path) => path
    case other =>
      val cat = catalog.getOrElse(sys.error(
        s"no catalog bound: use graft.`<path>` to address $other"))
      other.split("[._]", 2) match {
        case Array(layer, name) if cat.Layers.contains(layer.toLowerCase) =>
          cat.table(layer.toLowerCase, name).root
        case _ => sys.error(s"cannot resolve table identifier: $other " +
          s"(expected <layer>.<table>, <layer>_<table>, or graft.`<path>`)")
      }
  }

  /** [[targetRoot]] plus the existence check every non-creating
    * statement wants (explicit-path idents skip it, matching the
    * relation read surfaces — an empty path errors in the statement's
    * own empty-table guard with a better message). */
  private def resolve(ident: String): VersionedTable = ident match {
    case PathIdent(path) => VersionedTable(spark, path)
    case other =>
      val tbl = VersionedTable(spark, targetRoot(other))
      if (!tbl.exists) sys.error(s"table not found: $other")
      tbl
  }
}

object GraftSql {
  val SmallFileBytesConf = "spark.graft.optimize.smallFileBytes"
  val DefaultSmallFileBytes: Long = 128L * 1024 * 1024

  // materialized-view definition properties (durable in _props.json —
  // REFRESH and post-restart re-arming read them back)
  val MvSourceProp = "graft.mv.source"
  val MvGroupProp = "graft.mv.group"
  val MvAggsProp = "graft.mv.aggs"
  val MvVersionProp = "graft.mv.sourceVersion"
  /** Bumped on every CREATE [OR REPLACE]: namespaces the refresh txn
    * ledger so markers from a PREVIOUS definition era (or a dropped-and-
    * recreated source whose version counter restarted) can never be
    * mistaken for this era's absorbed slices. */
  val MvEpochProp = "graft.mv.epoch"
  /** Optional row predicate of a FILTERED materialized view (`CREATE
    * MATERIALIZED VIEW … AS SELECT … FROM t WHERE pred GROUP BY …`).
    * Maintenance applies it to every slice; filtered MVs are queried BY
    * NAME (Databricks MV usage) and never arm transparent routing — the
    * rewrite rule serves only unfiltered definitions it can prove
    * equivalent. */
  val MvWhereProp = "graft.mv.where"

  /** Parse the closed MV select grammar → (groupCols, (fn, col, out)*).
    * Every group column must appear bare in the select list; every other
    * item must be `fn(col) AS name` with fn ∈ sum|count|min|max (`*`
    * only under count); output names must be unique and distinct from
    * group columns. */
  private[tables] def parseMvSelect(selectList: String,
      groupBy: String): (Seq[String], Seq[(String, String, String)]) = {
    val groupCols = splitTop(groupBy, ',').map(stripTicks)
    require(groupCols.forall(_.matches("""[A-Za-z_][A-Za-z0-9_]*""")),
      s"materialized view: GROUP BY must list plain columns, got $groupBy")
    val items = splitTop(selectList, ',')
    val (bare, aggs) = items.foldLeft(
      (Vector.empty[String], Vector.empty[(String, String, String)])) {
      case ((bs, as), MvAggItem(fn, c, out)) =>
        val cc = if (c == "*") "*" else stripTicks(c)
        // approx_count_distinct materializes as a MERGEABLE HLL sketch
        // ("hll" in the stored spec): refresh unions partial sketches
        // instead of rescanning history — the one distinct-count shape
        // an incremental MV can maintain
        val f = if (fn.equalsIgnoreCase("approx_count_distinct")) "hll"
          else fn.toLowerCase
        require(cc != "*" || f == "count",
          s"materialized view: $f(*) is not a materializable aggregate")
        (bs, as :+ ((f, cc, stripTicks(out))))
      // percentile_approx(c, q) materializes as a MERGEABLE log2-octave
      // histogram ("quant<q>" in the stored spec): bucket counts form a
      // group under addition, so refresh absorbs appends AND retractions
      // as signed bucket merges — the quantile shape an incremental MV
      // can maintain exactly (the estimate equals a rebuild's)
      case ((bs, as), MvQuantItem(c, qt, out)) =>
        require(qt.toDouble > 0 && qt.toDouble <= 1,
          s"materialized view: percentile_approx quantile must be in " +
            s"(0,1], got $qt")
        (bs, as :+ ((s"quant$qt", stripTicks(c), stripTicks(out))))
      // approx_top_k(c, k) materializes as CMS + candidate-set state
      // ("topk<k>"): append slices absorb as counter sums + candidate
      // unions; counters cannot retract, so deletes refresh through the
      // per-touched-group recompute, never a silent under-count
      case ((bs, as), MvTopkItem(c, k, out)) =>
        require(k.toInt > 0,
          s"materialized view: approx_top_k k must be positive, got $k")
        (bs, as :+ ((s"topk${k.toInt}", stripTicks(c), stripTicks(out))))
      case ((bs, as), MvColItem(c)) => (bs :+ stripTicks(c), as)
      case (_, item) => sys.error(
        "materialized view: select items must be a group column or " +
          s"sum|count|min|max|approx_count_distinct(col)|" +
          s"percentile_approx(col, q)|approx_top_k(col, k) AS name — got " +
          s"`${item.trim}` (avg is derived by the rewrite rule from " +
          "sum+count)")
    }
    require(bare.toSet == groupCols.toSet,
      s"materialized view: select list's bare columns ${bare.mkString(",")} " +
        s"must equal GROUP BY ${groupCols.mkString(",")}")
    require(aggs.nonEmpty, "materialized view: at least one aggregate")
    val outs = aggs.map(_._3)
    require((outs ++ groupCols).distinct.size == outs.size + groupCols.size,
      s"materialized view: duplicate output names in ${outs.mkString(",")}")
    (groupCols, aggs)
  }

  /** Register precision for materialized `approx_count_distinct`
    * columns: ±~1.6%/√2^lgK ≈ 2.5% at 12, KB-scale per group. */
  private[graft] val MvHllLgK = 12

  /** Histogram resolution for materialized `percentile_approx` columns:
    * readouts land within 1/(2·sub) ≈ 3.1% relative (+0.5/scale
    * absolute) of the exact rank statistic; ≤64·sub buckets per sign
    * live at once — KB-scale per group at any data size. */
  private[graft] val MvQuantScale = 100L
  private[graft] val MvQuantSub = 16

  /** CMS parameters for materialized `approx_top_k` columns: ±eps·n
    * counting error at the stated confidence, KB-scale per group; the
    * library rollup's defaults (`ops/Sketches.freqRollup`). */
  private[graft] val MvCmsEps = 0.0005
  private[graft] val MvCmsConfidence = 0.99
  private[graft] val MvCmsSeed = 42

  /** Is `fn` a stored percentile-histogram spec (`quant<q>`)? */
  private[graft] def isQuantFn(fn: String): Boolean = fn.startsWith("quant")
  /** The quantile a `quant<q>` spec names, as its verbatim literal. */
  private[graft] def quantQ(fn: String): String = fn.stripPrefix("quant")
  /** Is `fn` a stored heavy-hitter spec (`topk<k>`)? */
  private[graft] def isTopkFn(fn: String): Boolean = fn.startsWith("topk")
  /** The k a `topk<k>` spec names. */
  private[graft] def topkK(fn: String): Int = fn.stripPrefix("topk").toInt
  /** Aggregates whose MV columns are ESTIMATES (sketches/histograms) —
    * these must never transparently replace a query's own aggregate
    * (different estimator, silently different numbers), so definitions
    * carrying any of them refresh-only and never arm routing. */
  private[graft] def approxAgg(fn: String): Boolean =
    fn == "hll" || isQuantFn(fn) || isTopkFn(fn)

  /** Register every custom function the MV build/maintain/read paths
    * may call (quant histograms, CMS scalars, top-k state) — idempotent
    * and quiet, invoked at each funnel entry. */
  private[graft] def registerMvFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    graft.functions.QuantFunctions.register(spark)
    graft.functions.SketchFunctions.register(spark)
    graft.functions.TopkFunctions.register(spark)
  }

  private[graft] def mvAggColumns(
      aggs: Seq[(String, String, String)]): Seq[Column] =
    aggs.map { case (fn, c, out) =>
      (fn match {
        case "sum"   => org.apache.spark.sql.functions.sum(col(c))
        case "count" => if (c == "*")
          org.apache.spark.sql.functions.count(lit(1))
        else org.apache.spark.sql.functions.count(col(c))
        case "min"   => org.apache.spark.sql.functions.min(col(c))
        case "max"   => org.apache.spark.sql.functions.max(col(c))
        // the STORED column is the sketch (BINARY, mergeable);
        // presentation projects hll_sketch_estimate — see presentMvRead
        case "hll"   => org.apache.spark.sql.functions.call_function(
          "hll_sketch_agg", col(c), lit(MvHllLgK))
        // the STORED column is the histogram (map<bigint,bigint>,
        // signed-mergeable); presentation runs the per-row cumulative
        // readout — see presentMvRead. Callers must have
        // registerMvFunctions'd (every MV funnel entry does)
        case qf if isQuantFn(qf) =>
          org.apache.spark.sql.functions.call_function(
            "graft_quant_hist", col(c).cast("double"), lit(1L),
            lit(MvQuantScale), lit(MvQuantSub))
        // the STORED column is struct<sketch, cands> (CMS + candidate
        // set, both mergeable); presentation ranks and slices to k —
        // see presentMvRead. Items ride as strings (uniform hash family)
        case tf if isTopkFn(tf) =>
          org.apache.spark.sql.functions.call_function(
            "graft_topk_agg", col(c).cast("string"), lit(topkK(tf)),
            lit(MvCmsEps), lit(MvCmsConfidence), lit(MvCmsSeed))
      }).as(out)
    }

  /** Row-filter predicate applied to every governed read of the table
    * (`ALTER TABLE … SET ROW FILTER (pred)`). May reference
    * `current_principal()` — a LIVE expression folded from
    * `spark.graft.principal` per query execution
    * ([[graft.functions.CurrentPrincipal]]; NULL when unset — a filter
    * comparing against it then matches nothing, deny-by-default). */
  val RowFilterProp = "graft.rowFilter"
  /** Per-column mask expressions (`ALTER TABLE … ALTER COLUMN c SET
    * MASK (expr)`): property key `graft.columnMask.<col>`. */
  val ColumnMaskPrefix = "graft.columnMask."
  /** Column comments (`COMMENT ON COLUMN t.c IS '…'`): property key
    * `graft.columnComment.<col>`; table comments use plain `comment`. */
  val ColumnCommentPrefix = "graft.columnComment."

  /** `current_principal()` → a string literal, TEXT-level. Governed
    * reads no longer use this (they bind the live
    * [[graft.functions.CurrentPrincipal]] expression); it remains for
    * parser-only passes — identifier scans over policy/view text where
    * a bare `parseExpression` just needs principal-free attributes. */
  private[graft] def substPrincipal(sql: String,
                                    principal: Option[String]): String =
    """(?i)current_principal\s*\(\s*\)""".r.replaceAllIn(sql,
      java.util.regex.Matcher.quoteReplacement(
        principal.map(p => "'" + p.replace("'", "''") + "'")
          .getOrElse("CAST(NULL AS STRING)")))

  /** The fully-governed reader-facing relation: MV sketch presentation
    * ([[presentMvRead]]), then the row filter (on UNMASKED values —
    * the filter is policy, it must see the truth), then column masks
    * (cast back to the column's type, so the governed schema equals
    * the physical one). This is what [[Catalog.registerViews]] binds —
    * SQL readers see policy-trimmed rows and masked values; the
    * physical table is reached only by owner-level library code, the
    * same trust line the grants ledger draws.
    *
    * `current_principal()` in the policy text stays a LIVE expression
    * ([[graft.functions.CurrentPrincipal]]) in the registered plan:
    * Catalyst folds it to the session's `spark.graft.principal` per
    * query execution, so flipping the principal conf changes what the
    * very next query sees — no re-registration. */
  private[graft] def governedRead(tbl: VersionedTable): DataFrame = {
    // ONE properties read serves presentation and policy — this runs
    // per table per registerViews, and _props.json is a file read
    val props = tbl.properties
    val base = presentMvRead(tbl, props)
    graft.functions.CurrentPrincipal.register(base.sparkSession)
    val filtered = props.get(RowFilterProp)
      .fold(base)(p => base.filter(expr(p)))
    val masks = props.collect {
      case (k, v) if k.startsWith(ColumnMaskPrefix) =>
        k.stripPrefix(ColumnMaskPrefix) -> v
    }
    if (masks.isEmpty) filtered
    else filtered.select(base.schema.fields.toSeq.map { f =>
      masks.get(f.name).fold(col(f.name))(m =>
        expr(m).cast(f.dataType).as(f.name))
    }: _*)
  }

  /** The reader-facing relation of an MV table: sketch-typed columns
    * (the `hll` specs' BINARY storage) present as their BIGINT
    * estimates under the SAME name, everything else verbatim — so
    * `SELECT approx_users FROM gold_mv` reads a number, while REFRESH
    * keeps merging the underlying registers. Non-MV tables (or
    * sketch-free MVs) pass through untouched. */
  private[graft] def presentMvRead(tbl: VersionedTable): DataFrame =
    presentMvRead(tbl, tbl.properties)

  private[graft] def presentMvRead(tbl: VersionedTable,
                                   props: Map[String, String]): DataFrame = {
    val df = tbl.read
    val specs = (props.get(MvAggsProp).toSeq ++
      props.get(graft.plans.JoinMv.AggsProp).toSeq).flatMap(parseAggSpecs)
    val hllOuts = specs.collect { case ("hll", _, o) => o }.toSet
    // quant columns present as the DOUBLE readout of their stored
    // histogram: a per-row cumulative walk over the ≤2k-entry map
    // (Sketches.quantReadoutSql) — no join, no shuffle, no companion
    val quantOuts = specs.collect {
      case (f, _, o) if isQuantFn(f) => o -> quantQ(f)
    }.toMap
    // topk columns present as the k-sliced, estimate-ranked readout of
    // their stored state: array<struct<item, est_count>> — per-row
    // transform over the O(k) candidate array, no join, no shuffle
    val topkOuts = specs.collect {
      case (f, _, o) if isTopkFn(f) => o -> topkK(f)
    }.toMap
    if (hllOuts.isEmpty && quantOuts.isEmpty && topkOuts.isEmpty) df
    else {
      if (topkOuts.nonEmpty) // the readout calls graft_cms_estimate
        graft.functions.SketchFunctions.register(df.sparkSession)
      df.select(df.columns.toSeq.map { c =>
        if (hllOuts(c))
          org.apache.spark.sql.functions.call_function(
            "hll_sketch_estimate", col(c)).as(c)
        else if (topkOuts.contains(c))
          expr(topkReadoutSql(c, topkOuts(c))).as(c)
        else quantOuts.get(c).fold(col(c))(q =>
          expr(graft.ops.Sketches.quantReadoutSql(c, q,
            MvQuantScale, MvQuantSub)).as(c))
      }: _*)
    }
  }

  /** Per-row heavy-hitter readout of one stored topk struct: estimate
    * every candidate against the row's own sketch, rank (est desc,
    * item asc — deterministic), slice to k. */
  private[graft] def topkReadoutSql(c: String, k: Int): String =
    s"""slice(array_sort(
      transform($c.cands, i -> named_struct(
        'item', i, 'est_count', graft_cms_estimate($c.sketch, i))),
      (a, b) -> IF(a.est_count > b.est_count, -1,
        IF(a.est_count < b.est_count, 1,
          IF(a.item < b.item, -1, IF(a.item > b.item, 1, 0))))),
      1, $k)"""

  /** Txn-app-id prefix for MV maintenance merges (replay idempotence). */
  private[graft] val MvTxnApp = "graft-mv:"

  /** History actions that change NO data an incremental maintainer can
    * observe: compaction/z-order/REORG rewrite identical rows;
    * rename/drop-column commits are metadata-only (zero rows — the DDL
    * guards refuse touching maintained columns and re-key agg/distinct
    * specs on rename); partition-layout evolution re-tags future
    * writes. A slice of only these is a covered-version bump, and any
    * of them interleaved with data commits must NOT demote the
    * incremental path. ONE definition — the single-table MV, join MV,
    * and sketch-rollup refreshers all consult it, and they must agree. */
  private[graft] val AbsorblessActions: Set[String] = Set(
    "compact", "zorder", "purge_dv",
    "rename_column", "drop_column", "set_partition_layout",
    "expire_pins")

  /** Shared per-touched-group recompute+merge — the maintenance core
    * for agg sets that cannot absorb retractions as signed deltas
    * (min/max, companion-less sums). `touched` names the groups the
    * change slice moved; ONLY those groups re-aggregate from
    * `freshRows` (the caller's pinned-snapshot relation — filtered
    * single-table scan or fact⋈dim join) and replace-merge into the
    * MV, with vanished groups riding the SAME commit as tombstone-
    * marked rows — one markered merge per slice, atomic under crash
    * replay by construction (no delete-then-replace ordering to keep
    * straight). Throws [[CdfNotExpressible]] on NULL group keys (NULL
    * never matches in a SQL MERGE — the caller recomputes). Kept in
    * ONE place so the single-table and join-MV paths cannot drift. */
  private[graft] def mergeTouchedGroups(mv: VersionedTable,
      touchedKeys: DataFrame, freshRows: => DataFrame,
      groupCols: Seq[String], aggs: Seq[(String, String, String)],
      txnApp: String, version: Long): Unit = {
    registerMvFunctions(touchedKeys.sparkSession)
    // both persisted deltas (touched keys, fresh aggregates) are
    // group-count-sized shuffle outputs: cached under the AQE scope so
    // their partitioning collapses to the data, not shuffle.partitions
    // (the un-scoped cache ran 32-task stages over ≤12 rows — ProfQ r17)
    VersionedTable.withAqeCachedPartitioning(touchedKeys.sparkSession) {
    val touched = touchedKeys
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one full-consumption probe: both guards AND the persist
      // materializes (limit-style probes void caching — [[probeDelta]])
      val (nTouched, nNullKeys) = probeDelta(touched, groupCols)
      if (nTouched == 0L) () // DDL-only slice: nothing moved
      else if (nNullKeys > 0L)
        throw new CdfNotExpressible("group-recompute refresh: NULL " +
          s"value in group column(s) ${groupCols.mkString(",")} — " +
          "NULL keys cannot merge; recomputing")
      else {
        // semi-join the SOURCE ROWS before aggregating — the whole
        // point is to shuffle only the touched groups' rows, never
        // aggregate the full source and discard (AQE broadcasts the
        // touched-key set when small, so the semi join adds no shuffle)
        val fresh = freshRows
          .join(touched, groupCols, "left_semi")
          .groupBy(groupCols.map(col): _*)
          .agg(mvAggColumns(aggs).head, mvAggColumns(aggs).tail: _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // ONE commit: vanished groups ride the SAME merge as the
          // re-aggregated ones — tombstone-marked key rows union with
          // the fresh rows (missing agg columns pad NULL; tombstones
          // only need their keys), so the replace, the deletes, and the
          // txn marker are atomic. The previous tombstones-first /
          // replace-second two-commit ordering was crash-resume
          // sensitive (the doc here once had to pin WHY the order
          // mattered); folded, there is no window to reason about and
          // no emptiness probe job for the gone set.
          val gone = touched.join(
              fresh.select(groupCols.map(col): _*), groupCols, "left_anti")
            .withColumn(graft.ops.Merge.DeleteCol, lit(true))
          mv.merge(
            fresh.withColumn(graft.ops.Merge.DeleteCol, lit(false))
              .unionByName(gone, allowMissingColumns = true),
            groupCols, updateExprs = aggs.map {
              case (_, _, o) => o -> ((_: Column, u: Column) => u)
            }.toMap, txn = Some((txnApp, version)))
          ()
        } finally { fresh.unpersist(); () }
      }
    } finally { touched.unpersist(); () }
    }
  }

  /** Any row with a NULL in a group column? (one short-circuit probe) */
  private[graft] def hasNullKeys(df: DataFrame, cols: Seq[String]): Boolean =
    !df.filter(cols.map(col(_).isNull).reduce(_ || _)).limit(1).isEmpty

  /** ONE full-consumption pass over a PERSISTED group-count-sized
    * delta: (row count, NULL-key row count) — and, critically, the
    * pass COMPLETES the cache. Limit-style probes ([[hasNullKeys]],
    * `isEmpty`) abort partition iterators mid-way and Spark only
    * caches fully-consumed partitions, so probing a persisted delta
    * that way leaves it cold and the merge that follows re-pays the
    * whole upstream scan + join + aggregation (measured 4.5 s of a
    * 13.5 s slice, ProfScd2). Every incremental maintainer that
    * persists a delta then merges it must probe through here. */
  private[graft] def probeDelta(delta: DataFrame,
                                groupCols: Seq[String]): (Long, Long) = {
    val r = delta.agg(
      org.apache.spark.sql.functions.count(lit(1)),
      org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum(
          when(groupCols.map(col(_).isNull).reduce(_ || _), 1L)
            .otherwise(0L)), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Whether `aggs` can absorb retractions from a row-level change feed:
    * sum/count/quant only, count(*) materialized (emptied groups must
    * drop), every sum(c) with a count(c) companion (NULL-fix). Quant
    * histograms need no companion — bucket counts retract directly and
    * the map carries its own value count. */
  private[graft] def cdfMaintainable(aggs: Seq[(String, String, String)]): Boolean =
    aggs.exists(a => a._1 == "count" && a._2 == "*") &&
      aggs.forall { case (f, c, _) =>
        f == "count" || isQuantFn(f) || (f == "sum" && aggs.exists(a =>
          a._1 == "count" && a._2 == c))
      }

  /** Apply one slice of a row-level change feed to an MV table as
    * SIGNED deltas (+postimage/insert, −preimage/delete) — shared by
    * `REFRESH MATERIALIZED VIEW` (one catch-up slice) and the
    * `graft-table` sink's `aggregate` mode (one micro-batch per call,
    * `txn`-markered for exactly-once replay). O(changed rows) + the
    * touched MV cells; emptied groups drop; a surviving group whose
    * values went all-NULL gets its sum NULL-fixed via the count(c)
    * companion. Requires [[cdfMaintainable]] aggs. The emptied-group
    * drop and sum NULL-fix ride INSIDE the markered merge commit
    * ([[graft.ops.Merge.PostCombine]]): one commit per slice, no
    * post-merge probe reads of the MV, and no crash window between the
    * marker and a follow-up repair — a replayed batch no-ops the whole
    * thing atomically. ([[sweepCdfPhantoms]] remains the healed-resume
    * repair for phantoms committed by pre-fold binaries.) */
  private[graft] def applyCdfDelta(mv: VersionedTable, feed: DataFrame,
                                   groupCols: Seq[String],
                                   aggs: Seq[(String, String, String)],
                                   txn: Option[(String, Long)],
                                   partitionBy: Seq[String] = Nil,
                                   numBuckets: Int =
                                     VersionedTable.DefaultMergeBuckets): Unit = {
    registerMvFunctions(feed.sparkSession)
    require(cdfMaintainable(aggs),
      "CDF aggregate maintenance needs count(*) plus sum/count/quant " +
        s"aggregates (with count(c) for every sum(c)); got ${aggs.mkString(",")}")
    val sgn = when(col("_change_type")
      .isin("insert", "update_postimage"), 1L)
      .when(col("_change_type")
        .isin("delete", "update_preimage"), -1L)
    val signedAggs = aggs.map {
      case ("count", "*", o) =>
        org.apache.spark.sql.functions.sum(col("__sgn")).as(o)
      case ("count", c, o) => org.apache.spark.sql.functions.sum(
        when(col(c).isNotNull, col("__sgn")).otherwise(0L)).as(o)
      case ("sum", c, o) =>
        org.apache.spark.sql.functions.sum(col(c) * col("__sgn")).as(o)
      // the sign rides INTO the histogram: preimages subtract from
      // exactly the buckets they once incremented
      case (qf, c, o) if isQuantFn(qf) =>
        org.apache.spark.sql.functions.call_function("graft_quant_hist",
          col(c).cast("double"), col("__sgn"),
          lit(MvQuantScale), lit(MvQuantSub)).as(o)
      case (f, c, _) => sys.error(s"unreachable: $f($c) on the cdf path")
    }
    // persisted: the emptiness probe and the merge must not each pay
    // the feed scan + aggregation shuffle (this is the streaming sink's
    // per-trigger hot path); the materialized delta is group-count-sized
    val session = feed.sparkSession
    // let AQE right-size the CACHED delta's partitioning: by default
    // Spark pins a cached plan's output partitioning (the conf below is
    // false), so a handful of changed groups stays spread over
    // shuffle.partitions cache partitions and every consumer (probe,
    // staged split) pays that many fixed task overheads per read —
    // measured ~60-100ms each on the scd2 slice (ProfScd2). Scoped to
    // this delta's lifecycle and restored in the finally.
    val cachedPartConf =
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    val prevCachedPart = session.conf.getOption(cachedPartConf)
    session.conf.set(cachedPartConf, "true")
    val delta = feed.withColumn("__sgn", sgn)
      .groupBy(groupCols.map(col): _*)
      .agg(signedAggs.head, signedAggs.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one full-consumption probe: answers emptiness + NULL keys AND
      // completes the persist (see [[probeDelta]])
      val (nRows, nNullKeys) = probeDelta(delta, groupCols)
      // a DDL-only slice (rename/property commits carry no change rows)
      // must not stage an empty merge — and in the streaming sink a
      // pure-DDL version range batches as zero rows
      if (nRows == 0L) return
      // NULL group values cannot ride the merge (NULL never matches a
      // key — each batch would insert a fresh NULL row): refuse loudly.
      // REFRESH catches this and recomputes; the streaming sink surfaces
      // it to the user (coalesce the group column upstream).
      if (nNullKeys > 0L)
        throw new CdfNotExpressible("CDF aggregate maintenance: NULL " +
          s"value in group column(s) ${groupCols.mkString(",")} — NULL " +
          "keys cannot merge incrementally; coalesce them upstream")
      // the in-commit repair: post-combine values already hold the
      // post-merge counts, so the merge itself can (a) drop a group
      // whose count(*) reached zero — including a group inserted AND
      // deleted within this one slice, which must never land — and
      // (b) NULL-fix a sum whose count(c) companion hit zero (signed
      // arithmetic leaves 0 where a recompute would show NULL)
      val countStar = aggs.collectFirst { case ("count", "*", o) => o }.get
      val nullFixes = aggs.collect {
        case ("sum", c, o) =>
          val cnt = aggs.collectFirst { case ("count", `c`, oc) => oc }.get
          o -> when(col(cnt) === 0L, lit(null)).otherwise(col(o))
      }.toMap
      mv.merge(delta, groupCols, numBuckets = numBuckets,
        updateExprs = aggs.map {
        case ("count", _, o)              => o -> ((t: Column, u: Column) => t + u)
        case (qf, _, o) if isQuantFn(qf)  => o -> mvCombine(qf)
        case (_, _, o)                    => o -> mvCombine("sum")
      }.toMap, txn = txn, partitionBy = partitionBy,
        postCombine = Some(graft.ops.Merge.PostCombine(
          set = nullFixes, deleteWhen = Some(col(countStar) === 0L))))
    } finally {
      delta.unpersist()
      prevCachedPart.fold(session.conf.unset(cachedPartConf))(
        session.conf.set(cachedPartConf, _))
    }
  }

  /** Idempotent standalone repair of the CDF maintenance invariants:
    * drop emptied groups (count(*) == 0, as a recompute would) and
    * NULL-fix sums whose count(c) companion hit zero (signed arithmetic
    * leaves a number where a recompute would show NULL). Probes guard
    * the commits, so a clean table costs two short-circuit reads and no
    * commit. Since the repair was folded INTO [[applyCdfDelta]]'s merge
    * commit (PostCombine), this runs ONLY at REFRESH entry on a
    * ledger-healed resume: new commits can't leave phantoms, but a
    * slice committed by a pre-fold binary whose process died between
    * the markered merge and the then-separate follow-ups would — the
    * healed resume reads that slice as covered and short-circuits to
    * noop, so entry is the one place left to repair it. */
  private[graft] def sweepCdfPhantoms(mv: VersionedTable,
      aggs: Seq[(String, String, String)]): Unit = {
    aggs.collectFirst { case ("count", "*", o) => o }.foreach { countStar =>
      if (!mv.read.filter(col(countStar) === 0L).limit(1).isEmpty) {
        mv.delete(col(countStar) === 0L)
        ()
      }
      aggs.foreach {
        case ("sum", c, o) =>
          aggs.collectFirst { case ("count", `c`, oc) => oc }.foreach { cnt =>
            val stale = mv.read
              .filter(col(cnt) === 0L && col(o).isNotNull).limit(1)
            if (!stale.isEmpty) {
              mv.update(Map(o -> lit(null).cast(mv.read.schema(o).dataType)),
                col(cnt) === 0L && col(o).isNotNull)
              ()
            }
          }
        case _ => ()
      }
    }
  }

  /** Parse the `fn:col:out;…` agg-spec string (the [[MvAggsProp]]
    * format, also the sink's `aggregate` option). */
  private[graft] def parseAggSpecs(s: String): Seq[(String, String, String)] =
    s.split(";").toSeq.map { one =>
      one.split(":", 3) match {
        case Array(f, c, o) if Set("sum", "count", "min", "max", "hll")(f) ||
            (isQuantFn(f) &&
              scala.util.Try(quantQ(f).toDouble).toOption
                .exists(q => q > 0 && q <= 1)) ||
            (isTopkFn(f) &&
              scala.util.Try(topkK(f)).toOption.exists(_ > 0)) =>
          (f, c, o)
        case _ => sys.error(s"bad aggregate spec `$one` (expected " +
          "fn:col:out with fn in sum|count|min|max|hll|quant<q>|topk<k>)")
      }
    }

  /** Combine a delta aggregate into the MV row under merge. sum uses the
    * nullable-combine (`coalesce(t+u, t, u)`): a delta group whose
    * values are all NULL arrives with sum NULL and must not erase the
    * accumulated value; least/greatest already skip NULL args. */
  private[graft] def mvCombine(fn: String): (Column, Column) => Column =
    fn match {
      case "sum"   => (t, u) =>
        org.apache.spark.sql.functions.coalesce(t + u, t, u)
      case "count" => (t, u) => t + u
      case "min"   => (t, u) => org.apache.spark.sql.functions.least(t, u)
      case "max"   => (t, u) => org.apache.spark.sql.functions.greatest(t, u)
      // register-wise max — the union EXACTLY equals a full rebuild's
      // sketch. coalesce: a delta group whose values were all NULL
      // aggregates to a NULL sketch and must not erase the registers
      case "hll"   => (t, u) => org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.call_function("hll_union", t, u),
        t, u)
      // bucket-wise SIGNED addition, zero-net buckets dropped — the
      // merged histogram EXACTLY equals a rebuild's (counts form a
      // group under addition, so this combine serves appends AND
      // signed CDF deltas alike)
      case qf if isQuantFn(qf) => (t, u) => {
        import org.apache.spark.sql.functions.{coalesce, map_filter, map_zip_with, lit => l}
        coalesce(map_filter(
          map_zip_with(t, u, (_, a, b) =>
            coalesce(a, l(0L)) + coalesce(b, l(0L))),
          (_, x) => x =!= 0L), t, u)
      }
      // counter-wise sketch sum + candidate union, estimate-pruned —
      // mirrors the library freq rollup's merge + pruneCandidates
      case tf if isTopkFn(tf) => (t, u) =>
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.call_function(
            "graft_topk_combine", t, u,
            org.apache.spark.sql.functions.lit(topkK(tf))), t, u)
    }

  /** UTC timestamp literal → epoch millis (`yyyy-MM-dd[ HH:mm:ss]`,
    * `T` separator accepted) — shared by SQL AS OF forms and the
    * streaming source's `startingTimestamp` option. */
  private[graft] def parseTsUtc(ts: String): Long = {
    val t = ts.trim
    val ldt =
      if (t.contains(" ") || t.contains("T"))
        java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      else java.time.LocalDate.parse(t).atStartOfDay // date-only literal
    ldt.atZone(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
  }

  /** Session-wide counter behind AS OF temp-view names (see
    * [[GraftSql.rewriteTimeTravel]]) — per-statement counters collide. */
  private[tables] val asofViewId = new java.util.concurrent.atomic.AtomicLong(0L)

  def apply(spark: SparkSession, catalog: Catalog): GraftSql =
    new GraftSql(spark, Some(catalog))
  def apply(spark: SparkSession): GraftSql = new GraftSql(spark, None)

  // Identifier: a backticked explicit path, or a dotted/underscored name.
  private val Ident = """(graft\.`[^`]+`|[\w.]+)"""
  private val OptimizeWhereStmt =
    ("""(?is)\s*OPTIMIZE\s+""" + Ident +
      """\s+WHERE\s+(.+?)\s*;?\s*""").r
  private val OptimizeStmt =
    ("""(?is)\s*OPTIMIZE\s+""" + Ident +
      """(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""").r
  private val FsckStmt =
    ("""(?is)\s*FSCK\s+REPAIR\s+TABLE\s+""" + Ident +
      """(\s+DRY\s+RUN)?\s*;?\s*""").r
  private val RestoreVersionStmt =
    ("""(?is)\s*RESTORE\s+TABLE\s+""" + Ident +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private val RestoreTimestampStmt =
    ("""(?is)\s*RESTORE\s+TABLE\s+""" + Ident +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""").r
  private val RestoreTagStmt =
    ("""(?is)\s*RESTORE\s+TABLE\s+""" + Ident +
      """\s+TO\s+TAG\s+'([^']+)'\s*;?\s*""").r
  private val CloneStmt =
    ("""(?is)\s*CREATE\s+TABLE\s+""" + Ident +
      """\s+SHALLOW\s+CLONE\s+""" + Ident + """\s*;?\s*""").r
  // materialized views: a deliberately closed grammar (single source
  // table, plain GROUP BY, sum/count/min/max select list) — exactly the
  // surface the MvRewrite rule can serve and the incremental refresher
  // can maintain; anything richer is refused loudly at CREATE time, not
  // silently mis-maintained later
  private val CreateMvProbe =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW\b.*""".r
  private val CreateMvRe =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW\s+""" +
      Ident + """\s+AS\s+SELECT\s+(.+?)\s+FROM\s+""" + Ident +
      """(?:\s+WHERE\s+(.+?))?\s+GROUP\s+BY\s+([\w`,\s]+?)\s*;?\s*""").r
  /** CREATE MV split with literal masking: the keyword scan runs over a
    * copy whose string-literal CONTENTS are blanked (delimiters kept, so
    * backticked path identifiers still match), then every group slices
    * the ORIGINAL text by offset — keyword-shaped data inside a WHERE
    * literal (`WHERE src = 'a GROUP BY b'`) cannot shift the split. */
  private[tables] def parseCreateMv(stmt: String)
      : Option[(Boolean, String, String, String, Option[String], String)] = {
    val mask = stringLiteralMask(stmt)
    val chars = stmt.toCharArray
    var i = 0
    while (i < chars.length) {
      val c = chars(i)
      if (mask(i) && c != '\'' && c != '"' && c != '`') chars(i) = 'x'
      i += 1
    }
    val m = CreateMvRe.pattern.matcher(new String(chars))
    if (!m.matches()) return None
    def g(idx: Int): Option[String] =
      if (m.group(idx) == null) None
      else Some(stmt.substring(m.start(idx), m.end(idx)))
    Some((m.group(1) != null, g(2).get, g(3).get, g(4).get,
      g(5).map(_.trim), g(6).get))
  }
  private val RefreshMvStmt =
    ("""(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+""" + Ident +
      """\s*;?\s*""").r
  // the JOIN form of CREATE MV — INNER equi-joins of a fact with one
  // or MORE dims, each with USING (same-named keys) or
  // ON f.k = d.k [AND …] (qualifiers are the joined tables' names);
  // maintained by [[graft.plans.JoinMv]] (star schema: dims pinned)
  private val IdentNc = """(?:graft\.`[^`]+`|[\w.]+)"""
  private val CreateMvJoinRe =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW\s+""" +
      Ident + """\s+AS\s+SELECT\s+(.+?)\s+FROM\s+""" + Ident +
      """((?:\s+JOIN\s+""" + IdentNc +
      """\s+(?:USING\s*\([\w`,\s]+?\)|ON\s+.+?))+)""" +
      """(?:\s+WHERE\s+(.+?))?""" +
      """\s+GROUP\s+BY\s+([\w`,\s]+?)\s*;?\s*""").r
  private val JoinSegRe =
    ("""(?is)\s*(""" + IdentNc +
      """)\s+(?:USING\s*\(([\w`,\s]+?)\)|ON\s+(.+?))\s*""").r

  /** Join-form CREATE MV split, literal-masked like [[parseCreateMv]].
    * Returns (orReplace, mv, selectList, fact, joins, where?, groupBy)
    * where each join is (dimIdent, usingCols?, onCond?); None when the
    * statement has no JOIN (the single-table parser owns it). */
  private[tables] def parseCreateMvJoin(stmt: String)
      : Option[(Boolean, String, String, String,
        Seq[(String, Option[String], Option[String])], Option[String],
        String)] = {
    val mask = stringLiteralMask(stmt)
    val chars = stmt.toCharArray
    var i = 0
    while (i < chars.length) {
      val c = chars(i)
      if (mask(i) && c != '\'' && c != '"' && c != '`') chars(i) = 'x'
      i += 1
    }
    val m = CreateMvJoinRe.pattern.matcher(new String(chars))
    if (!m.matches()) return None
    def g(idx: Int): Option[String] =
      if (m.group(idx) == null) None
      else Some(stmt.substring(m.start(idx), m.end(idx)))
    // the joins blob re-splits on the JOIN keyword (safe: the grammar's
    // ON conjuncts are qual.k = qual.k only — no literals to confuse)
    val joins = g(5).get.split("(?i)\\s+JOIN\\s+").toSeq
      .map(_.trim).filter(_.nonEmpty).map {
        case JoinSegRe(dim, using, on) =>
          (dim, Option(using), Option(on).map(_.trim))
        case seg => sys.error(
          s"materialized view join: unparseable JOIN clause `$seg`")
      }
    Some((m.group(1) != null, g(2).get, g(3).get, g(4).get, joins,
      g(6), g(7).get))
  }

  /** Bounds (start, end) of the top-level AND separators of a masked
    * predicate — what `(?i)\s+AND\s+` found before, minus two classes
    * of false splits: an AND inside parentheses (so `NOT (d.a AND d.b)`
    * stays ONE conjunct instead of re-assembling as the semantically
    * different `(NOT (d.a)) AND (d.b)`), and the AND that pairs a
    * BETWEEN's bounds (SQL's grammar binds it tighter than
    * conjunction — `c BETWEEN x AND y` is one predicate). One pending
    * BETWEEN is tracked per paren depth and cleared on close-paren;
    * runs on the literal-masked text, so parens/keywords inside string
    * constants never count. */
  private[tables] def topLevelAndBounds(ms: String): List[(Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    val pendingBetween = scala.collection.mutable.Map.empty[Int, Int]
      .withDefaultValue(0)
    var depth = 0
    var i = 0
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < ms.length) {
      val c = ms.charAt(i)
      if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') {
        pendingBetween(depth) = 0
        depth = math.max(0, depth - 1); i += 1
      } else if (isWord(c)) {
        val s = i
        while (i < ms.length && isWord(ms.charAt(i))) i += 1
        ms.substring(s, i).toUpperCase match {
          case "BETWEEN" => pendingBetween(depth) += 1
          case "AND" =>
            if (pendingBetween(depth) > 0) pendingBetween(depth) -= 1
            else if (depth == 0) {
              // widen over flanking whitespace, and split only when
              // whitespace-delimited on both sides — exactly the old
              // regex's \s+AND\s+ contract
              var a = s
              while (a > 0 && ms.charAt(a - 1).isWhitespace) a -= 1
              var b = i
              while (b < ms.length && ms.charAt(b).isWhitespace) b += 1
              if (a < s && b > i) { out += ((a, b)); () }
            }
          case _ => ()
        }
      } else i += 1
    }
    out.toList
  }

  /** Attribute a join-MV WHERE clause to dim sides. Each top-level
    * AND-ed conjunct must reference qualified columns of exactly ONE
    * dim (`d.is_current`, `d.tier = 'gold'`); the qualifiers are
    * stripped so the predicate applies to that dim relation alone
    * ([[graft.plans.JoinMv.DimSide.filter]]), which is what keeps dim
    * batches absorbing as signed deltas (σ distributes over ΔD).
    * Fact-side or cross-side conjuncts are refused — a fact filter
    * does NOT commute with the fact-CDF maintenance path as stored.
    * Splitting and reference-scanning run on a literal-masked copy so
    * `AND` or `a.b` inside a string constant never confuses the
    * grammar. Returns one optional filter per dim, positionally. */
  private[tables] def attributeJoinMvWhere(where: Option[String],
      factIdent: String, dimIdents: Seq[String]): Seq[Option[String]] = {
    val acc = Array.fill[List[String]](dimIdents.length)(Nil)
    where.map(_.trim).filter(_.nonEmpty).foreach { w =>
      val mask = stringLiteralMask(w)
      val maskedChars = w.toCharArray
      var i = 0
      while (i < maskedChars.length) {
        val c = maskedChars(i)
        if (mask(i) && c != '\'' && c != '"' && c != '`') maskedChars(i) = 'x'
        i += 1
      }
      val ms = new String(maskedChars)
      val bounds = topLevelAndBounds(ms)
      val starts = 0 :: bounds.map(_._2)
      val ends = bounds.map(_._1) ::: List(w.length)
      // '.' only — the layer.name convention. '_' is NOT a layer
      // separator here: blindly aliasing `my_dim` as `dim` would let a
      // conjunct mis-attribute to the wrong dim (or raise spurious
      // ambiguity) whenever idents share an underscore suffix. An
      // underscore-spelled catalog ident stays addressable by its exact
      // full name.
      def formsOf(id: String): Set[String] = {
        val idn = stripTicks(id).toLowerCase
        Set(idn, idn.split("\\.", 2).last)
      }
      val factForms = formsOf(factIdent)
      // qualifiers are IDENTIFIER-shaped (leading letter/underscore, or
      // backticked): a decimal literal's `0.5` must never read as
      // qualifier `0` column `5`. The column side keeps its backticks
      // (`is current` stays quoted in the stored filter).
      val QualRef =
        """(`[^`]+`|[A-Za-z_][\w.]*)\.(`[^`]+`|[A-Za-z_]\w*)""".r
      starts.zip(ends).foreach { case (s, e) =>
        val conj = w.substring(s, e).trim
        val lead = s + w.substring(s, e).indexOf(conj)
        val conjMasked = ms.substring(lead, lead + conj.length)
        // refs FOUND on the masked text (literal-safe), but every piece
        // of text kept or validated reads from the ORIGINAL at the same
        // offsets — masked 'x' runs must never leak into the definition
        val refs = QualRef.findAllMatchIn(conjMasked)
          .filterNot(m => mask(lead + m.start)).toList
        def orig(m: scala.util.matching.Regex.Match, g: Int): String =
          conj.substring(m.start(g), m.end(g))
        require(refs.nonEmpty, "materialized view join WHERE: conjunct " +
          s"`$conj` has no qualified column reference — qualify " +
          "columns with the joined table names")
        val sides = refs.map { m =>
          val q = stripTicks(orig(m, 1)).toLowerCase
          if (factForms(q)) -1
          else {
            val hits = dimIdents.zipWithIndex
              .filter { case (d, _) => formsOf(d)(q) }.map(_._2)
            require(hits.nonEmpty, "materialized view join WHERE: " +
              s"unknown qualifier `${orig(m, 1)}` in `$conj` — qualify " +
              "with a joined table's name")
            require(hits.length == 1, "materialized view join WHERE: " +
              s"qualifier `${orig(m, 1)}` in `$conj` matches more than " +
              s"one dim (${hits.map(dimIdents).mkString(", ")}) — use " +
              "the full table name")
            hits.head
          }
        }
        require(!sides.contains(-1),
          s"materialized view join WHERE: `$conj` references the FACT " +
            "side — only dim-side predicates are supported in the join " +
            "form (filter the fact with a single-table MV upstream)")
        require(sides.distinct.length == 1,
          s"materialized view join WHERE: `$conj` references multiple " +
            "dims — each conjunct must touch exactly one dim")
        val sb = new StringBuilder(conj)
        refs.reverse.foreach(m => { sb.replace(m.start, m.end, orig(m, 2)); () })
        acc(sides.head) ::= sb.toString
      }
    }
    acc.toSeq.map(l =>
      if (l.isEmpty) None
      else Some(l.reverse.map(c => s"($c)").mkString(" AND ")))
  }

  /** Key pairs of the join form: USING lists same-named pairs; ON takes
    * AND-ed `qual.col = qual.col` equalities where each qualifier is a
    * joined table's name (full ident or its name part). */
  private[tables] def parseJoinKeys(usingCols: Option[String],
      onCond: Option[String], factIdent: String,
      dimIdent: String): Seq[(String, String)] = usingCols match {
    case Some(cs) =>
      cs.split(",").toSeq.map(c => stripTicks(c.trim)).filter(_.nonEmpty)
        .map(c => (c, c))
    case None =>
      val JoinEq =
        """(?is)\s*`?([\w.]+)`?\.`?(\w+)`?\s*=\s*`?([\w.]+)`?\.`?(\w+)`?\s*""".r
      // '.' only, same reasoning as attributeJoinMvWhere's formsOf: an
      // underscore is part of the name, never a qualifier separator
      def forms(id: String): Set[String] = {
        val idn = stripTicks(id).toLowerCase
        Set(idn, idn.split("\\.", 2).last)
      }
      def side(q: String): Char = {
        val qn = stripTicks(q).toLowerCase
        if (forms(factIdent)(qn)) 'f'
        else if (forms(dimIdent)(qn)) 'd'
        else sys.error("materialized view join: unknown qualifier " +
          s"`$q` — qualify key columns with the joined table names")
      }
      onCond.get.split("(?i)\\s+AND\\s+").toSeq.map {
        case JoinEq(q1, c1, q2, c2) => (side(q1), side(q2)) match {
          case ('f', 'd') => (c1, c2)
          case ('d', 'f') => (c2, c1)
          case _ => sys.error("materialized view join: each ON " +
            "conjunct must equate a fact column with a dim column")
        }
        case other => sys.error("materialized view join: unsupported " +
          s"ON conjunct `${other.trim}` (only qual.k = qual.k equalities)")
      }
  }
  // durable (non-TEMP) views: CREATE VIEW persists the definition in
  // the warehouse ledger so a NEW session's catalog re-registers it —
  // the reference's persistent UC view (vw_player_fixture_horizon,
  // 00_create_uc_objects.py:312-324). TEMP/GLOBAL TEMP views do not
  // match (keyword between CREATE and VIEW) and stay Spark-native.
  private val CreateViewStmt =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.+?)\s*;?\s*""".r
  private val CreateViewQualifiedStmt =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([\w.`]+)\s+AS\s+(.+?)\s*;?\s*""".r
  private val DropViewStmt =
    """(?is)\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*""".r
  private val ShowViewsStmt = """(?is)\s*SHOW\s+VIEWS\s*;?\s*""".r
  private val ShowMvsStmt =
    """(?is)\s*SHOW\s+MATERIALIZED\s+VIEWS\s*;?\s*""".r
  // governance (resources/uc/grants.sql:26-60 — the reference's grant
  // template): privileges are comma-separated words (possibly
  // multi-word: USE SCHEMA / ALL PRIVILEGES), principals backticked
  // group names or bare words
  val PrincipalConf: String = graft.functions.CurrentPrincipal.Conf
  private val GrantStmt =
    """(?is)\s*GRANT\s+([\w\s,]+?)\s+ON\s+(?i:(TABLE|SCHEMA|CATALOG))\s+([\w.`]+)\s+TO\s+`?([\w@.-]+)`?\s*;?\s*""".r
  private val RevokeStmt =
    """(?is)\s*REVOKE\s+([\w\s,]+?)\s+ON\s+(?i:(TABLE|SCHEMA|CATALOG))\s+([\w.`]+)\s+FROM\s+`?([\w@.-]+)`?\s*;?\s*""".r
  private val ShowGrantsOnCatalogStmt =
    """(?is)\s*SHOW\s+GRANTS\s+ON\s+CATALOG\s*;?\s*""".r
  private val ShowGrantsOnStmt =
    """(?is)\s*SHOW\s+GRANTS\s+ON\s+(?:(?i:(TABLE|SCHEMA|CATALOG))\s+)?([\w.`]+)\s*;?\s*""".r
  private val ShowGrantsToStmt =
    """(?is)\s*SHOW\s+GRANTS\s+TO\s+`?([\w@.-]+)`?\s*;?\s*""".r
  private val ShowGrantsStmt = """(?is)\s*SHOW\s+GRANTS\s*;?\s*""".r
  // enforcement heads ([[GraftSql.checkGrants]])
  private[tables] val GrantAdminHead = """(?is)^\s*(GRANT|REVOKE)\b.*""".r
  private[tables] val ShowGrantsHead = """(?is)^\s*SHOW\s+GRANTS\b.*""".r
  private[tables] val ModifyHead =
    ("""(?is)^\s*(?:OPTIMIZE|VACUUM|RESTORE|INSERT|UPDATE|DELETE|MERGE|COPY""" +
      """|ALTER|DROP|CREATE|REORG|TRUNCATE|REFRESH|CONVERT|ANALYZE|FSCK""" +
      """|COMMENT)\b.*""").r
  // UNDROP's target does not EXIST yet (it is in the trash), so the
  // generic scan's existence filter would skip it — dedicated head
  private[tables] val UndropHead = """(?is)^\s*UNDROP\b.*""".r
  private[tables] val ReadHead =
    ("""(?is)^\s*(?:SELECT|WITH|DESCRIBE|DESC|SHOW|VALUES|TABLE""" +
      """|FROM)\b.*""").r
  // plain (non-materialized) views only: their target is an undotted NEW
  // object, so the first named table is a SOURCE and must be charged
  // SELECT. CREATE MATERIALIZED VIEW keeps the MODIFY head — its dotted
  // target occupies the target slot (MODIFY if it already exists), and
  // position charges its sources SELECT.
  private[tables] val CreateViewHead =
    ("""(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:GLOBAL\s+)?""" +
      """(?:TEMP(?:ORARY)?\s+)?VIEW\b.*""").r
  // one MAXIMAL word-and-dot token per candidate identifier — the token
  // is then split by the same `split("[._]", 2)` the resolver uses, so
  // enforcement and execution can never disagree on where a name splits
  private[tables] val IdentToken = """\b[A-Za-z]\w*(?:\.\w+)*\b""".r
  // a backtick-quoted WORD-SHAPED name — Spark resolves it exactly like
  // the bare token, so grant enforcement must see it too (path bodies
  // contain '/' and never match)
  private[tables] val TickedIdent = """`([A-Za-z]\w*(?:[._]\w+)*)`""".r

  /** Strip backticks around word-shaped quoted names so the grant scan
    * sees `` `silver_orders` ``, `` `Silver`.`gov` ``, ``silver.`gov` ``
    * exactly as their bare spellings. Non-word bodies (paths) keep
    * their ticks; ticks inside string literals may drop but the
    * content stays quote-masked either way. */
  private[tables] def untickWordNames(s: String): String =
    TickedIdent.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(m.group(1)))
  private val MvAggItem =
    """(?is)\s*(sum|count|min|max|approx_count_distinct)\s*\(\s*(\*|`[^`]+`|\w+)\s*\)\s+AS\s+(`[^`]+`|\w+)\s*""".r
  // two-arg approximate-percentile form; q must be a plain numeric
  // literal — its TEXT is kept verbatim in the stored spec (`quant<q>`)
  // so the readout replays exactly the quantile the DDL named
  private val MvQuantItem =
    """(?is)\s*(?:percentile_approx|approx_percentile)\s*\(\s*(`[^`]+`|\w+)\s*,\s*([0-9]*\.?[0-9]+)\s*\)\s+AS\s+(`[^`]+`|\w+)\s*""".r
  // approx_top_k(col, k): k a positive int literal, kept in the spec
  // (`topk<k>`) — presentation slices the stored candidate state to k
  private val MvTopkItem =
    """(?is)\s*approx_top_k\s*\(\s*(`[^`]+`|\w+)\s*,\s*(\d+)\s*\)\s+AS\s+(`[^`]+`|\w+)\s*""".r
  private val MvColItem = """(?is)\s*(`[^`]+`|\w+)\s*""".r
  private val ConvertStmt =
    ("""(?is)\s*CONVERT\s+TO\s+GRAFT\s+parquet\.`([^`]+)`\s+AS\s+""" +
      Ident + """\s*;?\s*""").r
  private val AnalyzeStmt =
    ("""(?is)\s*ANALYZE\s+TABLE\s+""" + Ident +
      """\s+COMPUTE\s+STATISTICS\s+FOR\s+COLUMNS\s+([\w`,\s]+?)\s*;?\s*""").r
  private val AnalyzeAllStmt =
    ("""(?is)\s*ANALYZE\s+TABLE\s+""" + Ident +
      """\s+COMPUTE\s+STATISTICS\s+FOR\s+ALL\s+COLUMNS\s*;?\s*""").r
  private val VacuumStmt =
    ("""(?is)\s*VACUUM\s+""" + Ident +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?(\s+IGNORE\s+PINS)?""" +
      """(\s+DRY\s+RUN)?\s*;?\s*""").r
  private val VacuumDetailStmt =
    ("""(?is)\s*VACUUM\s+""" + Ident +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?\s+DRY\s+RUN\s+DETAIL\s*;?\s*""").r
  private val VacuumExpireStmt =
    ("""(?is)\s*VACUUM\s+""" + Ident +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?\s+FORCE\s+EXPIRE\s+PINS""" +
      """\s+OLDER\s+THAN\s+(\d+)\s+(MINUTE|HOUR|DAY)S?\s*;?\s*""").r
  // refusal probe: FORCE EXPIRE PINS with no (or a malformed) OLDER
  // THAN clause must fail naming the missing age bound, not fall
  // through to Spark's parser with an opaque syntax error
  private val VacuumExpireBareStmt =
    ("""(?is)\s*VACUUM\s+""" + Ident +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?\s+FORCE\s+EXPIRE\s+PINS""" +
      """(\s+OLDER\s+THAN\b.*?)?\s*;?\s*""").r
  private val ShowPinsStmt =
    ("""(?is)\s*SHOW\s+PINS\s+""" + Ident + """\s*;?\s*""").r
  private val ShowAllPinsStmt =
    """(?is)\s*SHOW\s+PINS\s*;?\s*""".r
  private val ExplainRewriteStmt =
    """(?is)\s*EXPLAIN\s+REWRITE\s+(.+?)\s*;?\s*""".r
  private val DropPinStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+DROP\s+PIN\s+'([^']+)'\s*;?\s*""").r
  private val DescHistoryStmt =
    ("""(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+""" + Ident + """\s*;?\s*""").r
  private val DescDetailStmt =
    ("""(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+""" + Ident + """\s*;?\s*""").r
  private val PathIdent = """graft\.`([^`]+)`""".r

  // ----------------------------------------------------- DML statement forms
  private val CreateSchemaStmt =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+""" + Ident +
      """\s*\((.+)\)\s*(?:USING\s+\w+)?\s*;?\s*""").r
  private val CtasStmt =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+""" + Ident +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?\s+AS\s+((?:SELECT|VALUES|WITH|TABLE|FROM|\()(?:.|\n)*?)\s*;?\s*""").r
  private val DropTableStmt =
    ("""(?is)\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?""" + Ident + """\s*;?\s*""").r
  private val UndropTableStmt =
    ("""(?is)\s*UNDROP\s+TABLE\s+""" + Ident + """\s*;?\s*""").r
  private val DeleteStmt =
    ("""(?is)\s*DELETE\s+FROM\s+""" + Ident +
      """(?:\s+WHERE\s+(.+?))?\s*;?\s*""").r
  private val UpdateStmt =
    ("""(?is)\s*UPDATE\s+""" + Ident +
      """\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*""").r
  private val InsertStmt =
    ("""(?is)\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?""" + Ident +
      """\s+((?:SELECT|VALUES|WITH|TABLE|FROM|\()(?:.|\n)*?)\s*;?\s*""").r
  // named-column form: INSERT INTO t (a, b) VALUES/SELECT … — unlisted
  // columns land NULL (generated ones compute, identity ones stamp).
  // Must be tried BEFORE InsertStmt: the plain regex would swallow the
  // column list as a parenthesized query and hand it to spark.sql.
  private val InsertColsStmt =
    ("""(?is)\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?""" + Ident +
      """\s*\(\s*((?:`[^`]+`|\w+)(?:\s*,\s*(?:`[^`]+`|\w+))*)\s*\)\s*""" +
      """((?:SELECT|VALUES|WITH|TABLE|FROM|\()(?:.|\n)*?)\s*;?\s*""").r
  // replaceWhere: the predicate capture is lazy, fenced by the query's
  // leading keyword — a quoted literal containing SELECT/VALUES cannot
  // start the query group (it would not follow the \s+ boundary as a
  // bare keyword), and a genuinely ambiguous statement fails loudly in
  // expr()/spark.sql downstream, never silently
  private val InsertReplaceStmt =
    ("""(?is)\s*INSERT\s+INTO\s+(?:TABLE\s+)?""" + Ident +
      """\s+REPLACE\s+WHERE\s+(.+?)\s+""" +
      """((?:SELECT|VALUES|WITH|TABLE|FROM|\()(?:.|\n)*)\s*;?\s*""").r
  // range-routing predicate shapes: the unquoted alternative matches
  // ONLY numeric literals — a bare identifier (`WHERE a = b`, a column
  // comparison) must fall through to the general expression path, never
  // be silently treated as a string literal
  private val EqPred =
    """(?is)\s*(`[^`]+`|\w+)\s*=\s*(?:'([^']*)'|(-?\d+(?:\.\d+)?))\s*""".r
  private val BetweenPred =
    ("""(?is)\s*(`[^`]+`|\w+)\s+BETWEEN\s+(?:'([^']*)'|(-?\d+(?:\.\d+)?))""" +
      """\s+AND\s+(?:'([^']*)'|(-?\d+(?:\.\d+)?))\s*""").r

  /** The ONE parser for range-routable predicates (DELETE/UPDATE/REPLACE
    * WHERE share it): `col = lit` → (col, lit, lit), `col BETWEEN a AND
    * b` → (col, a, b), anything else → None (general expression path). */
  private[tables] def parseRangePred(
      cond: String): Option[(String, String, String)] = cond match {
    case EqPred(c, q, b) =>
      val v = if (q != null) q else b
      Some((stripTicks(c), v, v))
    case BetweenPred(c, q1, b1, q2, b2) =>
      Some((stripTicks(c), if (q1 != null) q1 else b1,
        if (q2 != null) q2 else b2))
    case _ => None
  }
  private val TruncateStmt =
    ("""(?is)\s*TRUNCATE\s+TABLE\s+""" + Ident + """\s*;?\s*""").r
  private val DescTableStmt =
    ("""(?is)\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?""" + Ident + """\s*;?\s*""").r
  private val CopyIntoStmt =
    ("""(?is)\s*COPY\s+INTO\s+""" + Ident +
      """\s+FROM\s+'([^']+)'\s+FILEFORMAT\s*=\s*(\w+)\s*;?\s*""").r
  private val TimeTravelProbe = """(?is)\bAS\s+OF\b""".r
  private val AtVersionProbe = """(?i)@v\d+""".r
  private val AtVersion = ("""(?i)""" + Ident + """@v(\d+)""").r
  private val TableChangesProbe = """(?i)\btable_changes\s*\(""".r
  private val TableChangesCall =
    """(?is)\btable_changes\s*\(\s*'([^']+)'\s*,\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r
  private val TimeTravelVersion =
    ("""(?i)""" + Ident + """\s+VERSION\s+AS\s+OF\s+(\d+)""").r
  private val TimeTravelTag =
    ("""(?i)""" + Ident + """\s+VERSION\s+AS\s+OF\s+'([^']+)'""").r
  private val CreateTagStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+CREATE\s+TAG\s+(`[^`]+`|[\w.\-]+)""" +
      """(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*""").r
  private val DropTagStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+DROP\s+TAG\s+(`[^`]+`|[\w.\-]+)\s*;?\s*""").r
  private val ShowTagsStmt =
    ("""(?is)\s*SHOW\s+TAGS\s+""" + Ident + """\s*;?\s*""").r
  private val TimeTravelTimestamp =
    ("""(?i)""" + Ident + """\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'""").r
  // TBLPROPERTIES surface. The schema-form regex relies on backtracking:
  // the greedy column capture gives ground until the REQUIRED
  // TBLPROPERTIES keyword matches, so the split lands at the last
  // `) [USING x] TBLPROPERTIES (` boundary.
  private val CreateSchemaPropsStmt =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+""" + Ident +
      """\s*\((.+)\)\s*(?:USING\s+\w+\s*)?TBLPROPERTIES\s*\((.+)\)\s*;?\s*""").r
  // schema-form CREATE with a partition spec (Delta's
  // `CREATE TABLE t (...) USING delta PARTITIONED BY (p)`), optionally
  // followed by TBLPROPERTIES
  private val CreateSchemaPartsStmt =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+""" + Ident +
      """\s*\((.+)\)\s*(?:USING\s+\w+\s*)?PARTITIONED\s+BY\s*""" +
      """\(([^)]*)\)(?:\s*TBLPROPERTIES\s*\((.+)\))?\s*;?\s*""").r
  private val CtasPropsStmt =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+""" + Ident +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?\s+TBLPROPERTIES\s*\((.+?)\)""" +
      """\s+AS\s+((?:SELECT|VALUES|WITH|TABLE|FROM|\()(?:.|\n)*?)\s*;?\s*""").r
  private val SetPropsStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*""").r
  private val UnsetPropsStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+UNSET\s+TBLPROPERTIES\s+(IF\s+EXISTS\s+)?\(([^)]*)\)\s*;?\s*""").r
  private val ShowPropsStmt =
    ("""(?is)\s*SHOW\s+TBLPROPERTIES\s+""" + Ident + """\s*;?\s*""").r
  private val ShowPartitionsStmt =
    ("""(?is)\s*SHOW\s+PARTITIONS\s+""" + Ident + """\s*;?\s*""").r
  private val ShowCreateStmt =
    ("""(?is)\s*SHOW\s+CREATE\s+TABLE\s+""" + Ident + """\s*;?\s*""").r
  private val ShowTablesStmt = """(?is)\s*SHOW\s+TABLES\s*;?\s*""".r
  private val ReorgStmt =
    ("""(?is)\s*REORG\s+TABLE\s+""" + Ident +
      """\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*""").r
  private val GenerateManifestStmt =
    ("""(?is)\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+""" +
      Ident + """\s*;?\s*""").r

  /** `'k' = 'v', "k2" = v2, …` → pairs. Values may contain `=`; keys may
    * not (split at the first top-level `=`). */
  private def parseProps(s: String): Seq[(String, String)] =
    splitTop(s, ',').map(_.trim).filter(_.nonEmpty).map { e =>
      val i = e.indexOf('=')
      require(i > 0, s"TBLPROPERTIES: expected 'key' = 'value', got: $e")
      (unquote(e.substring(0, i)), unquote(e.substring(i + 1)))
    }

  /** Apply `f` to the segments of `s` OUTSIDE single-/double-quoted and
    * backticked spans (the spans pass through verbatim). Rewriters that
    * pattern-match raw SQL text use this to keep literals as data. */
  private[tables] def mapOutsideLiterals(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var state = ' ' // ' ' = outside, else the active quote char
    var esc = false
    def flush(): Unit = { out ++= f(seg.toString); seg.clear() }
    s.foreach { c =>
      if (state != ' ') {
        out += c
        if (esc) esc = false
        else if (c == '\\' && state != '`') esc = true
        else if (c == state) state = ' '
      } else if (c == '\'' || c == '`' || c == '"') {
        flush(); state = c; out += c
      } else seg += c
    }
    flush()
    out.toString
  }

  /** true at every index where a textual rewrite must NOT begin: inside
    * a `'…'` or `"…"` STRING literal (quotes included, `\`-escapes
    * honored — Spark's default parser accepts `'don\'t'`) and inside a
    * backtick-quoted identifier's BODY (a match starting there is part
    * of a quoted name — e.g. a column literally named `` `s.x` `` —
    * and rewriting it would nest backticks into malformed SQL). The
    * opening backtick itself stays false so rewriters whose match
    * begins OUTSIDE and legitimately spans `alias.`col`` still fire. */
  private[graft] def stringLiteralMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var state = ' ' // ' ' outside, '\''/'"' in string, '`' in identifier
    var esc = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      state match {
        case '\'' | '"' =>
          mask(i) = true
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == state) state = ' '
        case '`' =>
          mask(i) = true
          if (c == '`') state = ' '
        case _ =>
          if (c == '\'' || c == '"') { mask(i) = true; state = c }
          else if (c == '`') state = '`'
      }
      i += 1
    }
    mask
  }

  /** Remove the first TOP-LEVEL `NOT NULL` (outside quotes, backticks,
    * and parentheses) from a column def; None when there is none. */
  private[tables] def stripTopLevelNotNull(d: String): Option[String] = {
    var depth = 0; var inStr = false; var inTick = false; var inDq = false
    var esc = false
    var i = 0
    val U = d.toUpperCase(java.util.Locale.ROOT)
    def wordAt(j: Int, w: String): Boolean =
      U.startsWith(w, j) &&
        (j == 0 || !Character.isLetterOrDigit(d.charAt(j - 1))) &&
        (j + w.length >= d.length ||
          !Character.isLetterOrDigit(d.charAt(j + w.length)))
    while (i < d.length) {
      val c = d.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '\'') inStr = false
        i += 1 }
      else if (inTick) { if (c == '`') inTick = false; i += 1 }
      else if (inDq) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inDq = false
        i += 1 }
      else c match {
        case '\'' => inStr = true; i += 1
        case '`'  => inTick = true; i += 1
        case '"'  => inDq = true; i += 1
        case '('  => depth += 1; i += 1
        case ')'  => depth -= 1; i += 1
        case _ if depth == 0 && wordAt(i, "NOT") =>
          var j = i + 3
          while (j < d.length && Character.isWhitespace(d.charAt(j))) j += 1
          if (wordAt(j, "NULL"))
            return Some((d.substring(0, i) + d.substring(j + 4)).trim)
          i += 1
        case _ => i += 1
      }
    }
    None
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 &&
      ((t.head == '\'' && t.last == '\'') ||
        (t.head == '"' && t.last == '"'))) t.substring(1, t.length - 1)
    else t
  }

  private val AddColumnsStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ADD\s+COLUMNS?\s*\((.+)\)\s*;?\s*""").r
  private val RenameColumnStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+RENAME\s+COLUMN\s+(`[^`]+`|\w+)\s+TO\s+(`[^`]+`|\w+)\s*;?\s*""").r
  private val DropColumnStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+DROP\s+COLUMNS?\s+(`[^`]+`|\w+)\s*;?\s*""").r
  private val SetDefaultStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ALTER\s+COLUMN\s+(`[^`]+`|\w+)\s+SET\s+DEFAULT\s+(.+?)\s*;?\s*""").r
  private val DropDefaultStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ALTER\s+COLUMN\s+(`[^`]+`|\w+)\s+DROP\s+DEFAULT\s*;?\s*""").r
  private val RenameTableStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+RENAME\s+TO\s+""" + Ident + """\s*;?\s*""").r
  private val AlterColTypeStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ALTER\s+COLUMN\s+(`[^`]+`|\w+)\s+TYPE\s+([\w]+)\s*;?\s*""").r
  private val SetRowFilterStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+SET\s+ROW\s+FILTER\s*\((.+)\)\s*;?\s*""").r
  private val DropRowFilterStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+DROP\s+ROW\s+FILTER\s*;?\s*""").r
  private val SetMaskStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ALTER\s+COLUMN\s+(`[^`]+`|\w+)\s+SET\s+MASK\s*\((.+)\)\s*;?\s*""").r
  private val DropMaskStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ALTER\s+COLUMN\s+(`[^`]+`|\w+)\s+DROP\s+MASK\s*;?\s*""").r
  private val SetNotNullStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ALTER\s+COLUMN\s+(`[^`]+`|\w+)\s+SET\s+NOT\s+NULL\s*;?\s*""").r
  private val DropNotNullStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ALTER\s+COLUMN\s+(`[^`]+`|\w+)\s+DROP\s+NOT\s+NULL\s*;?\s*""").r
  private val ShowColumnsStmt =
    ("""(?is)\s*SHOW\s+COLUMNS\s+(?:IN|FROM)\s+""" + Ident +
      """\s*;?\s*""").r
  // Iceberg-style partition evolution: metadata-only re-declaration of
  // the hive layout; () evolves to flat
  private val SetPartitionedByStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+SET\s+PARTITIONED\s+BY\s*\(([^)]*)\)\s*;?\s*""").r
  // liquid-clustering-style declaration: cluster columns persist as the
  // `graft.clusterBy` property; every bare OPTIMIZE z-orders by them
  private val ClusterByStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+CLUSTER\s+BY\s+(?:\(([^)]*)\)|(NONE))\s*;?\s*""").r
  private val AddConstraintStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  // informational keys (Databricks PK/FK grammar, NOT ENFORCED implied;
  // RELY marks the assertion trusted for join elimination)
  private val AddPkStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ADD\s+CONSTRAINT\s+(\w+)\s+PRIMARY\s+KEY\s*\(([^)]+)\)""" +
      """(?:\s+NOT\s+ENFORCED)?(\s+RELY)?\s*;?\s*""").r
  private val AddFkStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+ADD\s+CONSTRAINT\s+(\w+)\s+FOREIGN\s+KEY\s*\(([^)]+)\)""" +
      """\s+REFERENCES\s+""" + Ident +
      """\s*(?:\(([^)]+)\))?(?:\s+NOT\s+ENFORCED)?(\s+RELY)?\s*;?\s*""").r
  private val DropConstraintStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Ident +
      """\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""").r
  // COMMENT ON: single-quoted text ('' = escaped quote) or NULL to unset.
  // The COLUMN form captures the whole dotted name; the last segment is
  // the column (the greedy Ident would swallow it otherwise).
  private val CommentTableStmt =
    ("""(?is)\s*COMMENT\s+ON\s+TABLE\s+""" + Ident +
      """\s+IS\s+('(?:[^']|'')*'|NULL)\s*;?\s*""").r
  private val CommentColumnStmt =
    """(?is)\s*COMMENT\s+ON\s+COLUMN\s+([\w.]+)\s+IS\s+('(?:[^']|'')*'|NULL)\s*;?\s*""".r
  private val MergeStmt =
    ("""(?is)\s*MERGE\s+INTO\s+""" + Ident + """(?:\s+AS)?\s+(\w+)""" +
      """\s+USING\s+(.+?)(?:\s+AS)?\s+(\w+)\s+ON\s+(.+?)\s+(WHEN\s+(?:.|\n)+?)\s*;?\s*""").r
  private val UpsertClauses =
    """(?is)\s*WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*""".r
  private val InsertOnlyClauses =
    """(?is)\s*WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*""".r
  private val DeleteClauses =
    """(?is)\s*WHEN\s+MATCHED\s+THEN\s+DELETE\s*""".r

  // --------------------------------------------- tiny top-level SQL scanners
  // (regexes can't honor quote/paren nesting; these three scanners are the
  // entire "parser" the owned grammar needs beyond the statement regexes)

  private def stripTicks(s: String): String =
    s.trim.stripPrefix("`").stripSuffix("`")

  /** Whitespace runs OUTSIDE string literals collapse to one space:
    * multiline/aligned DDL is legal SQL, but named-expr ledgers (CHECK
    * constraints) store their exprs line-framed and surface them
    * verbatim (SHOW CREATE TABLE), so the stored spelling is
    * canonicalized — same semantics whatever the statement's layout.
    * Quoted content passes through untouched (literals are data). */
  private[tables] def collapseExprWs(e: String): String = {
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < e.length) {
      val c = e.charAt(i)
      if (inQ) { sb += c; if (c == '\'') inQ = false; i += 1 }
      else if (c == '\'') { inQ = true; sb += c; i += 1 }
      else if (c.isWhitespace) {
        while (i < e.length && e.charAt(i).isWhitespace) i += 1
        sb += ' '
      } else { sb += c; i += 1 }
    }
    sb.result().trim
  }

  /** Source files under `dir`, recursively, skipping hidden/metadata
    * names — the same convention as Spark's file index. */
  private[tables] def listFiles(dir: String): Seq[String] = {
    val root = java.nio.file.Paths.get(dir)
    require(java.nio.file.Files.isDirectory(root),
      s"COPY INTO: no such directory $dir")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: java.nio.file.Path): Unit = {
      val ls = java.nio.file.Files.list(p)
      try ls.forEach { c =>
        val n = c.getFileName.toString
        if (!n.startsWith(".") && !n.startsWith("_")) {
          if (java.nio.file.Files.isDirectory(c)) walk(c) else out += c.toString
        }
      } finally ls.close()
    }
    walk(root)
    out.toSeq.sorted
  }

  /** Split on `sep` at nesting depth 0, respecting '...' and `...`. */
  private[tables] def splitTop(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    // double quotes tracked too: with Spark's default settings "…" is a
    // string literal, and a separator inside one is data
    var depth = 0; var inStr = false; var inTick = false; var inDq = false
    var esc = false
    s.foreach { c =>
      if (inStr) { cur += c
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '\'') inStr = false }
      else if (inTick) { cur += c; if (c == '`') inTick = false }
      else if (inDq) { cur += c
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inDq = false }
      else c match {
        case '\''               => inStr = true; cur += c
        case '`'                => inTick = true; cur += c
        case '"'                => inDq = true; cur += c
        case '('                => depth += 1; cur += c
        case ')'                => depth -= 1; cur += c
        case x if x == sep && depth == 0 => out += cur.toString; cur.clear()
        case x                  => cur += x
      }
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Top-level indices of keyword `kw` (case-insensitive, word-bounded):
    * quote/backtick-aware, paren-depth 0, and outside CASE…END — the one
    * SQL construct where WHEN/THEN nest without parentheses, so a merge
    * clause condition may itself contain a CASE expression. */
  private[tables] def topKeywordIndices(s: String, kw: String): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val U = s.toUpperCase(java.util.Locale.ROOT)
    val K = kw.toUpperCase(java.util.Locale.ROOT)
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    def wordAt(j: Int, w: String): Boolean =
      U.startsWith(w, j) && (j == 0 || !isWordChar(s.charAt(j - 1))) &&
        (j + w.length >= s.length || !isWordChar(s.charAt(j + w.length)))
    var depth = 0; var caseDepth = 0; var inStr = false; var inTick = false
    var inDq = false; var esc = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '\'') inStr = false
        i += 1 }
      else if (inTick) { if (c == '`') inTick = false; i += 1 }
      else if (inDq) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inDq = false
        i += 1 }
      else c match {
        case '\'' => inStr = true; i += 1
        case '`'  => inTick = true; i += 1
        case '"'  => inDq = true; i += 1
        case '('  => depth += 1; i += 1
        case ')'  => depth -= 1; i += 1
        case _ =>
          if (wordAt(i, "CASE")) { caseDepth += 1; i += 4 }
          else if (caseDepth > 0 && wordAt(i, "END")) { caseDepth -= 1; i += 3 }
          else if (depth == 0 && caseDepth == 0 && wordAt(i, K)) {
            out += i; i += K.length
          } else i += 1
      }
    }
    out.toSeq
  }

  /** Index of the first top-level occurrence of `target`, or -1. */
  private def topLevelIndexOf(s: String, target: Char): Int = {
    var depth = 0; var inStr = false; var inTick = false; var inDq = false
    var esc = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '\'') inStr = false
      }
      else if (inTick) { if (c == '`') inTick = false }
      else if (inDq) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inDq = false
      }
      else c match {
        case '\'' => inStr = true
        case '`'  => inTick = true
        case '"'  => inDq = true
        case '('  => depth += 1
        case ')'  => depth -= 1
        case x if x == target && depth == 0 => return i
        case _    =>
      }
      i += 1
    }
    -1
  }

  private def balanced(s: String): Boolean = {
    var depth = 0; var inStr = false; var inTick = false; var inDq = false
    var esc = false
    s.foreach { c =>
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '\'') inStr = false
      }
      else if (inTick) { if (c == '`') inTick = false }
      else if (inDq) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inDq = false
      }
      else c match {
        case '\'' => inStr = true
        case '`'  => inTick = true
        case '"'  => inDq = true
        case '('  => depth += 1
        case ')'  => depth -= 1; if (depth < 0) return false
        case _    =>
      }
    }
    depth == 0
  }
}
