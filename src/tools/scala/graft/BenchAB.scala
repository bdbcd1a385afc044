package graft

/** Interleaved same-host A/B bench protocol — the adjudication tool for
  * perf deltas this host's ±30-60% cross-day noise swamps.
  *
  * Problem it exists for (VERDICT r15): three watch items sat inside
  * the noise band; neither the builder's committed run nor the judge's
  * clean run (different days) could convict or exonerate them. A paired
  * design cancels host state: build TWO revisions (HEAD and a `git
  * worktree` of the comparison commit), then ALTERNATE single-pass
  * bench child-JVMs over the same query set in ONE session, pairing
  * consecutive runs. Slow host inflates both sides of a pair equally;
  * the per-pair ratio survives.
  *
  * Scheme: ABBA ordering (pair 1 runs A then B, pair 2 runs B then A,
  * ...) so a monotone within-session drift (thermal, page-cache
  * warming) cancels across pairs instead of biasing one side.
  *
  * Usage:
  * {{{
  * sbt -batch "runMain graft.BenchAB \
  *   target/scala-2.13/classes /tmp/r14/target/scala-2.13/classes \
  *   /root/testdata/sf0.1 3 BENCH_AB.json q_st10_apply_changes,q_st16_dedup_sink"
  * }}}
  * Child JVMs get the same flags sbt's fork gives Bench (add-opens,
  * 8g heap, 512m code cache). Each child publishes the standard Bench
  * JSON line; this tool pairs them and reports, per query, the
  * per-pair HEAD/base ratios for wall, task time, and (streaming)
  * per-batch seconds, plus each pass's calibration — so the artifact
  * carries the evidence for its own verdict.
  */
object BenchAB {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def runBench(classes: String, sfDir: String, only: Option[String],
                       logPath: java.nio.file.Path): Map[String, Any] = {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq("java") ++ addOpens ++ Seq(
      "-Xmx" + sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"),
      "-XX:ReservedCodeCacheSize=512m",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", s"/opt/spark/jars/*:$classes", "graft.Bench"))
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
    pb.environment().put("SPARK_GRAFT_CPUS",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // one pass per child: the pairing happens ACROSS JVMs; min-of-2
    // inside a child would hide exactly the variance we're measuring
    pb.environment().put("SPARK_GRAFT_BENCH_PASSES", "1")
    only.foreach(pb.environment().put("SPARK_GRAFT_BENCH_ONLY", _))
    pb.environment().remove("SPARK_GRAFT_PUBLISH") // never clobber BENCH_LATEST
    pb.environment().put("SPARK_GRAFT_NO_ROUND", "1") // nor BENCH_ROUND
    pb.redirectErrorStream(false)
    pb.redirectError(logPath.toFile)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    val line = out.linesIterator.find(_.startsWith("""{"metric""""))
      .getOrElse(sys.error(
        s"bench child (cp=$classes) exit=$code emitted no metric line; " +
          s"stderr at $logPath"))
    parse(line)
  }

  /** Bench-line JSON → maps/doubles we need (jackson tree, no schema). */
  private def parse(line: String): Map[String, Any] = {
    val n = mapper.readTree(line)
    def qmap(field: String): Map[String, Double] = {
      val o = n.get(field)
      if (o == null) Map.empty
      else {
        val it = o.fields()
        val b = Map.newBuilder[String, Double]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
        b.result()
      }
    }
    // null-guarded like qmap: a base-revision child predating the
    // calibration fields must degrade to cal_median=0.0, not NPE the
    // whole A/B session mid-run
    val cal = {
      val a = n.get("calibration_samples")
      if (a == null) Seq.empty[Double]
      else (0 until a.size()).map(a.get(_).asDouble()).sorted
    }
    Map(
      "total" -> n.get("value").asDouble(),
      "n_failed" -> n.get("n_failed").asInt(),
      "cal_median" -> (if (cal.isEmpty) 0.0 else cal(cal.length / 2)),
      "wall" -> qmap("queries"),
      "task" -> qmap("task_time_sec"),
      "batch" -> qmap("stream_batch_sec"))
  }

  private def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) Double.NaN
    else { val s = xs.sorted; s(s.length / 2) }

  private def fmt(d: Double): String =
    if (d.isNaN) "null"
    else String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))

  // caller-supplied paths ride into the output JSON — escape them so a
  // worktree path containing a quote/backslash can't produce an invalid
  // artifact (query names are self-generated identifiers; paths aren't)
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    require(args.length >= 5,
      "usage: BenchAB <headClasses> <baseClasses> <sfDir> <pairs> <out.json> [onlyCsv]")
    val Array(headCp, baseCp, sfDir, pairsS, outPath) = args.take(5)
    val pairs = pairsS.toInt
    val only = args.lift(5).filter(_.nonEmpty)
    val logDir = java.nio.file.Files.createTempDirectory("benchab-")

    // ABBA: even pairs run head-first, odd pairs base-first
    val passes = (0 until pairs).flatMap { p =>
      val order = if (p % 2 == 0) Seq("head" -> headCp, "base" -> baseCp)
                  else Seq("base" -> baseCp, "head" -> headCp)
      order.zipWithIndex.map { case ((side, cp), k) =>
        System.err.println(s"[benchab] pair ${p + 1}/$pairs ${side} starting")
        val r = runBench(cp, sfDir, only,
          logDir.resolve(s"pass-$p-$k-$side.log"))
        System.err.println(s"[benchab] pair ${p + 1} $side done: " +
          s"total=${r("total")} cal=${r("cal_median")} n_failed=${r("n_failed")}")
        (p, side, r)
      }
    }
    val heads = passes.collect { case (p, "head", r) => p -> r }.toMap
    val bases = passes.collect { case (p, "base", r) => p -> r }.toMap
    val names = (heads.values ++ bases.values)
      .flatMap(_("wall").asInstanceOf[Map[String, Double]].keys).toSeq
      .distinct.sorted

    def channel(r: Map[String, Any], ch: String, q: String): Option[Double] =
      r(ch).asInstanceOf[Map[String, Double]].get(q).filter(_ >= 0)

    val qJson = names.map { q =>
      def series(side: Map[Int, Map[String, Any]], ch: String) =
        (0 until pairs).map(p => side.get(p).flatMap(channel(_, ch, q)))
      def arr(xs: Seq[Option[Double]]) =
        xs.map(_.fold("null")(fmt)).mkString("[", ",", "]")
      def ratios(ch: String): Seq[Double] =
        (0 until pairs).flatMap { p =>
          for {
            a <- heads.get(p).flatMap(channel(_, ch, q))
            b <- bases.get(p).flatMap(channel(_, ch, q))
            if b > 0
          } yield a / b
        }
      val parts = Seq("wall", "task", "batch").flatMap { ch =>
        val hs = series(heads, ch); val bs = series(bases, ch)
        if (hs.flatten.isEmpty && bs.flatten.isEmpty) Nil
        else {
          // min-of-passes ratio: contention only ever INFLATES a pass,
          // so min(head)/min(base) is the robust channel when one pass
          // catches a transient the pairing can't cancel
          val minRatio = (hs.flatten, bs.flatten) match {
            case (h, b) if h.nonEmpty && b.nonEmpty && b.min > 0 =>
              h.min / b.min
            case _ => Double.NaN
          }
          Seq(
            s""""head_$ch":${arr(hs)}""", s""""base_$ch":${arr(bs)}""",
            s""""${ch}_ratio_median":${fmt(median(ratios(ch)))}""",
            s""""${ch}_ratio_min":${fmt(minRatio)}""")
        }
      }
      s""""$q":{${parts.mkString(",")}}"""
    }
    val passJson = passes.map { case (p, side, r) =>
      s"""{"pair":${p + 1},"side":"$side","total":${fmt(
        r("total").asInstanceOf[Double])},"n_failed":${r("n_failed")},"cal_median":${fmt(
        r("cal_median").asInstanceOf[Double])}}"""
    }.mkString("[", ",", "]")
    val out =
      s"""{"protocol":"interleaved-abba","pairs":$pairs,"sf":${jstr(sfDir)},""" +
        s""""head_classes":${jstr(headCp)},"base_classes":${jstr(baseCp)},""" +
        s""""only":${only.fold("null")(jstr)},""" +
        s""""passes":$passJson,"queries":{${qJson.mkString(",")}}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), out + "\n")
    println(out)
  }
}
