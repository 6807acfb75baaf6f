package graft

import org.scalatest.funsuite.AnyFunSuite

/** BASELINE.md's headline numbers drifted from the shipped artifacts
  * once already (r8: the winnow-phase prose said ~35 s while the
  * measured chain was 652 → 228 s — fixed by hand in r9). This spec
  * kills the class the CoverageDocSpec way: the LATEST
  * `BENCH_BUILDER_rN.json` in the repo root must have a matching
  * machine-readable pin line in BASELINE.md,
  *
  *   `<!-- bench_pin rN: queries=Q suite_sec=S cold_sec=C exec_sec=E -->`
  *
  * whose values are copied verbatim from the artifact's headline — so
  * the doc's round-N section can never describe numbers the artifact
  * does not carry. */
class BaselineDocSpec extends AnyFunSuite {

  private lazy val latest: (Int, java.io.File) = {
    val re = "BENCH_BUILDER_r(\\d+)\\.json".r
    val fs = new java.io.File(".").listFiles.toSeq.flatMap { f =>
      f.getName match {
        case re(n) => Some((n.toInt, f))
        case _ => None
      }
    }
    assert(fs.nonEmpty, "no BENCH_BUILDER_rN.json artifact in repo root")
    fs.maxBy(_._1)
  }

  test("latest builder artifact carries the round-11 method fields") {
    val (round, file) = latest
    if (round >= 11) {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper
      val root = mapper.readTree(file)
      // heap from the JVM, not a builder constant (ADVICE r10)
      assert(root.at("/covariates/heap_max_mb").asLong(-1) > 0,
        "heap_max_mb missing — builder ran without Bench's JVM heap field")
      // the round-over-round exec diff must be EMBEDDED so a >2x move
      // can never ship unflagged (VERDICT r10 Next #1)
      assert(root.at("/exec_regressions/vs").asText("").startsWith("BENCH_BUILDER_r"),
        "exec_regressions missing — artifact built without the regression diff")
      assert(root.at("/exec_regressions/flagged").isArray)
      // builder-vs-driver reconciliation (VERDICT r10 Next #7)
      assert(root.at("/reconciliation/builder_s_per_q").isNumber,
        "reconciliation missing")
      // cold entries carry [wall, exec, gc, load] from r11 on
      val cold = root.get("queries_cold_wall_exec")
      assert(cold != null && cold.size() > 0)
      val it = cold.elements()
      var checked = 0
      while (it.hasNext && checked < 5) {
        val e = it.next()
        if (!e.isNull) { assert(e.size() == 4, s"cold entry arity ${e.size()}"); checked += 1 }
      }
    }
    if (round >= 12) {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper
      val root = mapper.readTree(file)
      // cold-basis regression diff + anomaly windows (VERDICT r11 Next #4)
      assert(root.at("/cold_regressions/flagged").isArray,
        "cold_regressions missing — artifact built without the cold-basis diff")
      assert(root.at("/cold_regressions/anomaly_windows").isArray,
        "cold anomaly_windows missing")
      // coverage adds/removes listed, not silently dropped (ADVICE r11)
      assert(root.at("/exec_regressions/coverage_added").isArray,
        "coverage_added missing")
      assert(root.at("/exec_regressions/coverage_removed").isArray,
        "coverage_removed missing")
      // constant-kernel calibration at every phase boundary (VERDICT
      // r11 Next #5): [wall, exec] per point, all positive
      for (p <- Seq("prewarm", "pre_suite", "post_suite", "post_cold")) {
        val c = root.at(s"/calibration/$p")
        assert(c.isArray && c.size() == 2 && c.get(0).asDouble() > 0,
          s"calibration point $p missing or degenerate")
      }
      // per-fill warmup attribution (VERDICT r11 Next #7)
      val wf = root.get("warm_fills")
      assert(wf != null && wf.size() > 10,
        "warm_fills missing — warmup inflation not per-fill attributable")
    }
    if (round >= 13) {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper
      val root = mapper.readTree(file)
      // the kernel points must ALSO ride the stdout headline so the
      // driver-parsed BENCH_rN.json self-diagnoses contention without
      // the builder artifact (VERDICT r12 Next #2)
      for (p <- Seq("prewarm", "pre_suite", "post_suite", "post_cold")) {
        val c = root.at(s"/headline/calibration/$p")
        assert(c.isArray && c.size() == 2 && c.get(0).asDouble() > 0,
          s"headline calibration point $p missing — stdout line lacks the weather yardstick")
      }
      // explicit cold execution order (ADVICE r12: anomaly windows must
      // not lean on JSON object / HashMap iteration order)
      val co = root.get("cold_order")
      assert(co != null && co.isArray && co.size() == root.get("queries_cold_wall_exec").size(),
        "cold_order missing or not covering the cold pass")
    }
    if (round >= 14) {
      // The memo-policy claim ("every (session, dir)-pure query above
      // the >=5 exec-s warm tier is output-memoized") drifted from the
      // shipped artifact in r13 (emb_whiten 8.8 / cc_summary 5.6 /
      // g_motif_same_nation 5.1 warm exec-s, all memo=false, while
      // SCALE.md claimed full migration — VERDICT r13 Wrong #1/Next
      // #1). Machine-check it: any query whose warm exec median in the
      // PINNED artifact exceeds the cut-line and which the artifact
      // did not observe as an output-memo read needs a named exclusion
      // line in SCALE.md: `<!-- memo_exclusion: <query> ... -->`.
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper
      val root = mapper.readTree(file)
      val memoWarmed = {
        val it = root.get("memo_warmed").elements()
        val b = Set.newBuilder[String]
        while (it.hasNext) b += it.next().asText()
        b.result()
      }
      val scale = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("SCALE.md")), "UTF-8")
      val em = root.get("queries_exec_med").fields()
      val offenders = scala.collection.mutable.ListBuffer[String]()
      while (em.hasNext) {
        val e = em.next()
        val (q, sec) = (e.getKey, e.getValue.asDouble())
        if (sec > 5.0 && !memoWarmed.contains(q) &&
            !scale.contains(s"<!-- memo_exclusion: $q"))
          offenders += f"$q ($sec%.1f exec-s)"
      }
      assert(offenders.isEmpty,
        s"memo-policy drift: warm exec median > 5 s, memo=false, no " +
          s"`<!-- memo_exclusion: <query> ... -->` line in SCALE.md: " +
          offenders.mkString(", "))
    }
  }

  test("BASELINE.md pins the latest builder artifact's headline") {
    val (round, file) = latest
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val root = mapper.readTree(file)
    val h = root.get("headline")
    assert(h != null, s"${file.getName} has no headline object")
    val q = root.get("queries_med").size()
    val pin = s"<!-- bench_pin r$round: queries=$q " +
      s"suite_sec=${h.get("value").asText} " +
      s"cold_sec=${h.get("cold_sec").asText} " +
      s"exec_sec=${h.get("exec_sec").asText} -->"
    val doc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BASELINE.md")), "UTF-8")
    assert(doc.contains(pin),
      s"BASELINE.md is missing the pin line for ${file.getName}:\n  $pin")
  }
}
