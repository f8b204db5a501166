package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Methodology: a warmup pass first exercises the JVM-wide one-time
  * costs (whole-stage codegen/Janino, parquet reader init, and Spark 4's
  * string-collation machinery — the first `contains(lower(...))` in a
  * fresh JVM costs 20-120s of static init, measured on this image), so
  * per-query timings reflect steady-state throughput. Queries are forced
  * through the `noop` datasource sink: `count()` would let Catalyst prune
  * projections and under-measure the real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // session config + rationale + SPARK_GRAFT_CONF A/B hook live in
    // SessionDefaults (ADVICE r16 #2: ONE builder shared with every
    // profiling main, so dumps/profiles explain the timed session)
    val spark = SessionDefaults.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execOnce(name: String): Long = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        // Shared intermediates (shingle/pair/centroid/IVF tables) stay
        // cached ACROSS queries: every memoized table is bounded to one
        // (session, dir) entry, so there is no per-invocation block
        // leak — and the dedup family reuses one candidate build
        // instead of six. Engine-internal caches (connected components'
        // edge pin) unpersist themselves.
        System.nanoTime() - t0
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          spark.catalog.clearCache()
          -1L // failure marker: a broken query must not look fast
      }
    }

    /** Min of two runs in SECONDS — plus a third tie-breaker when the two
      * disagree by >2x, which on this VM means CPU steal hit at least one
      * of them (round-1 driver run: q_window_rank 3.5s vs 0.26s steady
      * state). The min is the steady-state cost. Any failed run poisons
      * the query's metric to -1.0 seconds (NOT -1 nanoseconds, which
      * would scale to an invisible -1e-9). */
    def exec(name: String): Double = {
      val a = execOnce(name)
      if (a < 0) return -1.0
      val b = execOnce(name)
      if (b < 0) return -1.0
      val m = math.min(a, b)
      val noisy = math.max(a, b) > 2L * m
      val best = if (!noisy) m else {
        val c = execOnce(name)
        if (c < 0) return -1.0
        math.min(m, c)
      }
      best / 1e9
    }

    // Warmup: string/regex/date/decimal/window/join/explode expression
    // classes + parquet scan path, once, untimed.
    try {
      spark.sql(
        """SELECT x, contains(lower(s), 'a'), regexp_extract(s, '([0-9]+)', 1),
          |  date_format(current_timestamp(), 'yyyy-MM-dd'), to_date('2024-01-01'),
          |  cast(x as decimal(18,2)) * cast(2 as decimal(18,2)),
          |  row_number() OVER (PARTITION BY s ORDER BY x),
          |  from_json(concat('{"k":', x, '}'), 'k INT').k,
          |  get_json_object(concat('{"k":', x, '}'), '$.k')
          |FROM (SELECT id AS x, concat('a', id) AS s,
          |        explode(split('a b', ' ')) AS t FROM range(100))""".stripMargin)
        .write.mode("overwrite").format("noop").save()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case e: Throwable =>
      // a warmup failure (e.g. bad SF dir) must not kill the report —
      // per-query markers will show what's broken
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }

    // Box calibration (VERDICT r13 #3): regression baselines cross
    // boxes — the r13 driver run (contended, median 1.14x inflation)
    // compared against an idle-box snapshot and flagged 14 queries of
    // which only 3 were real. A fixed CPU-bound probe timed in THIS
    // run, persisted with the snapshot, lets the gate normalize for
    // box provenance: the prev run's calib travels with its numbers,
    // and the allowance scales by curCalib/prevCalib (relax-only,
    // capped) so `regressed` measures plans, not boxes. The probe is
    // pure compute over range() — no I/O, no shuffle — sized ~0.5 s
    // on an idle 32-thread box, i.e. the same resource (CPU across all
    // cores) whose contention inflates the query times.
    def calibrateOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 32L << 20, 1, spark.sparkContext.defaultParallelism)
        .selectExpr("sum(crc32(cast(id as string))) as s")
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val calib = try { calibrateOnce(); math.min(calibrateOnce(), calibrateOnce()) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] calibration failed: ${e.getMessage}")
        -1.0
      }
    System.err.println(f"[bench] box calibration: $calib%.3f s")

    // I/O-mixed calibration probe (VERDICT r15 #2): the CPU-only probe
    // decoupled from the 160-query workload four times across r15
    // (probe 2.4-2.8x vs workload median 0.86-0.93, ~2.5 h, both
    // directions) — pure crc32-over-range() exercises none of the scan
    // path the workload actually spends in. This probe times a fixed
    // same-tier parquet scan+agg over lineitem (numeric sums + a string
    // length sum: file read, decompression, columnar decode, one
    // single-stage agg — no shuffle), under the same warmup-then-min-of-2
    // protocol. Both family figures travel in the report AND the rolled
    // snapshot; the gate normalizes by the MAX of the family ratios
    // (mirroring the r14 dual-pass max — each family can only RELAX),
    // and the roll gate's calib criterion requires EVERY family to read
    // the box comparably fast. Per-tier snapshots keep the probe
    // comparable (same file both sides).
    def calibrateIoOnce(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("sum(l_extendedprice) as a", "sum(l_quantity) as b",
          "sum(length(l_returnflag)) as c")
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val calibIo = try { calibrateIoOnce(); math.min(calibrateIoOnce(), calibrateIoOnce()) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] io calibration failed: ${e.getMessage}")
        -1.0
      }
    System.err.println(f"[bench] box io calibration: $calibIo%.3f s")

    // Prewarm the cross-query memoized tables (shingles, dedup pairs,
    // IVF/PQ quantizers, winnow fingerprints, bigram model input, BPE
    // merges) UNTIMED, so the first timed consumer of a shared cache is
    // not also its builder — the r11 driver run charged scoredPairs'
    // full rebuild to q_dedup_groups twice (6.95 s vs 0.40 steady) when
    // the box evicted blocks mid-run. Build costs stay observable via
    // the stderr log; SPARK_GRAFT_PREWARM=0 opts out (e.g. for probes
    // that want to TIME the builds, like ScaleProbe's cold protocol).
    // residency audit results for the report JSON: -1 = prewarm skipped
    var prewarmMemMb = -1.0
    var prewarmDiskMb = -1.0
    var prewarmCapMb = -1.0
    var prewarmOverflow = false
    // per-table prewarm build seconds (r17, VERDICT r16 #6): the
    // untimed shared-cache builds travel IN the report JSON, so any
    // growth of the untimed-precomputation set is a named field diff
    // between rounds instead of stderr archaeology; PrewarmSpec pins
    // the set itself.
    var prewarmTimes: Seq[(String, Double)] = Seq.empty
    if (!sys.env.get("SPARK_GRAFT_PREWARM").map(_.trim).contains("0")) {
      val times = graft.queries.Prewarm.shared(spark, sfDir)
      prewarmTimes = times
      System.err.println("[bench] prewarm " + times.map { case (n, t) =>
        f"$n=$t%.2fs" }.mkString(" "))
      // Residency audit — ACTIONABLE, not just logged (VERDICT r12): the
      // whole shared-cache block set must fit storage memory with
      // headroom, or mid-run eviction (the r11 failure mode) is
      // guaranteed rather than environmental. Any disk-resident block
      // means MEMORY_AND_DISK already spilled — headroom is ALREADY
      // gone — and >80% of unified memory leaves none for execution.
      // The `prewarm_overflow` field makes a future cache-set growth
      // regression a named in-run signal instead of "cache weather".
      prewarmMemMb = spark.sparkContext.getRDDStorageInfo
        .map(_.memSize).sum / 1e6
      prewarmDiskMb = spark.sparkContext.getRDDStorageInfo
        .map(_.diskSize).sum / 1e6
      prewarmCapMb = spark.sparkContext.getExecutorMemoryStatus
        .values.map(_._1).sum / 1e6
      prewarmOverflow =
        prewarmDiskMb > 0.0 || prewarmMemMb > 0.8 * prewarmCapMb
      System.err.println(
        f"[bench] prewarm cached mem $prewarmMemMb%.0f MB disk " +
          f"$prewarmDiskMb%.0f MB of $prewarmCapMb%.0f MB capacity" +
          (if (prewarmOverflow) " — PREWARM_OVERFLOW: shared cache " +
            "set no longer fits storage memory with headroom; expect " +
            "mid-run eviction re-charging build costs to queries"
          else ""))
    }

    // ANN mode (VERDICT r12 #6): with GRAFT_ANN_DIR set, the embedding
    // family reads the PERSISTED index (the amortized production path)
    // instead of training in-session — so this run times exactly that
    // family and rolls its own per-tier snapshot, keeping the registry
    // path on the same per-round regression trend as the oracle path.
    // Build the index first with graft.AnnIngest at the same sf dir.
    val annDirEnv = sys.env.get("GRAFT_ANN_DIR").map(_.trim)
      .filter(_.nonEmpty)
    val annMode = annDirEnv.isDefined
    if (annMode)
      System.err.println(s"[bench] ANN mode: registry at " +
        s"${annDirEnv.get}, queries limited to the embedding family")

    // optional comma-separated subset for local profiling runs (same
    // parsing as Verify: trimmed, empties dropped, blank value = no filter)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => !annMode ||
        graft.queries.NorthStarQueries.EmbeddingFamily.contains(n))
      .filter(n => only.forall(_.contains(n)))
    val results = names.map(n => n -> exec(n))

    // Per-TIER snapshot path (ADVICE r11): the default is keyed by the
    // sf dir's basename, so a full clean run at another tier (100x
    // probe corpus, sf0.01 spot checks) can never overwrite this
    // tier's baseline and zero out the next run's comparisons. The
    // legacy un-tiered bench_prev.json fallback (the r11->r12
    // migration bridge) is GONE: every tier has rolled calibrated
    // snapshots since, and the fallback meant a missing/unparseable
    // tiered snapshot silently compared against years-old
    // calibration-free provenance — misleading flags are worse than
    // "no comparison this run, next roll heals it".
    val tier = new java.io.File(sfDir).getName
    val modePrefix = if (annMode) "ann_" else ""
    val prevPath = sys.env.getOrElse("BENCH_PREV",
      s"/root/repo/bench_${modePrefix}prev_$tier.json")
    // Parsing + gate arithmetic live in BenchGate (spec-pinned; the
    // r14 gate-demo outcomes are BenchGateSpec assertions).
    val prevTxt: String = try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(prevPath)),
        java.nio.charset.StandardCharsets.UTF_8)
      catch { case _: Throwable => "" }
    val (prevQ: Map[String, Double], prevCalib: Option[Double]) =
      BenchGate.parseSnapshot(prevTxt, sfDir)
    // the I/O probe figure arrived r16; a legacy snapshot without it
    // degrades that family to scale 1.0 / criterion-skipped
    val prevCalibIo: Option[Double] =
      BenchGate.parseCalib(prevTxt, sfDir, "calib_io")

    // Box-provenance scale (VERDICT r13 #3): when both runs carry a
    // calibration figure, the gate's allowance stretches by the box
    // slowdown ratio (relax-only, capped — see BenchGate.boxScale). A
    // legacy snapshot without "calib" gets scale 1.0 (r13 behavior);
    // the roll below writes this run's figure so the NEXT comparison
    // is box-aware. This start-probe scale picks the CANDIDATES; the
    // confirmed-flag gate below re-derives the scale from a SECOND
    // probe timed at the confirmation pass (VERDICT r14 #4).
    // max over the probe families: each ratio is relax-only (floored at
    // 1.0), so a family missing on either side contributes nothing and
    // whichever family saw the contention stretches the gate
    val startScale: Double = math.max(BenchGate.boxScale(calib, prevCalib),
      BenchGate.boxScale(calibIo, prevCalibIo))
    if (startScale != 1.0)
      System.err.println(f"[bench] box scale vs snapshot: $startScale%.2fx " +
        f"(calib $calib%.3f s vs prev ${prevCalib.getOrElse(-1.0)}%.3f s; " +
        f"io $calibIo%.3f s vs prev ${prevCalibIo.getOrElse(-1.0)}%.3f s)")

    // Flag predicates. Over-budget: the driver's budget is ~1 s/query
    // with a 2x gate, so any steady-state time above 2 s gets NAMED
    // instead of hiding inside a growing total. Regression: the
    // boxScale-normalized two-sided gate (BenchGate.isRegression), so
    // a contended driver run against an idle-box snapshot flags plan
    // changes, not the box.
    val overFirst = results.collect { case (k, v) if v > 2.0 => k }
    // Candidate sweep uses the probe scale CLAMPED by the run's own
    // 160-query median ratio vs the snapshot (BenchGate.candidateScale)
    // — observed live this round: a probe reading 2.83x on the fastest
    // full run on record (median ratio 0.93) would have made a genuine
    // 2x regression invisible (never collected, so never re-timed).
    // Candidates are cheap (one re-run at end); the CONFIRMED gate
    // below keeps the max-of-probes scale (see candidateScale's doc
    // for why clamping that too would undo the r14 burst fix).
    val medRatio = BenchGate.medianRatio(results, prevQ)
    val candScale = BenchGate.candidateScale(startScale, medRatio)
    if (candScale != startScale)
      System.err.println(f"[bench] workload median ratio " +
        f"${medRatio.getOrElse(-1.0)}%.2f clamps candidate scale " +
        f"$startScale%.2fx -> $candScale%.2fx")
    val regFirst = results.collect {
      case (k, v) if v >= 0 &&
        prevQ.get(k).exists(BenchGate.isRegression(_, v, candScale)) => k
    }

    // Second calibration probe, timed AT the confirmation pass (VERDICT
    // r14 #4): the start probe is blind to a burst that begins after
    // it — the r14 driver run carried 29 transient flags at a MATCHED
    // start calib. The confirmed-flag gate normalizes by the max of the
    // two probes (BenchGate.gateCalib), so bursty contention between
    // the passes relaxes the gate instead of minting confirmed flags;
    // both figures are stamped in the report.
    val calibConfirm = try math.min(calibrateOnce(), calibrateOnce())
      catch { case e: Throwable =>
        System.err.println(s"[bench] confirm calibration failed: ${e.getMessage}")
        -1.0
      }
    val calibIoConfirm = try math.min(calibrateIoOnce(), calibrateIoOnce())
      catch { case e: Throwable =>
        System.err.println(s"[bench] confirm io calibration failed: ${e.getMessage}")
        -1.0
      }
    val boxScale: Double = math.max(
      BenchGate.boxScale(BenchGate.gateCalib(calib, calibConfirm), prevCalib),
      BenchGate.boxScale(BenchGate.gateCalib(calibIo, calibIoConfirm),
        prevCalibIo))
    if (boxScale != startScale)
      System.err.println(f"[bench] confirm-pass calib $calibConfirm%.3f s " +
        f"raises gate scale $startScale%.2fx -> $boxScale%.2fx")
    def isRegression(prev: Double, cur: Double): Boolean =
      BenchGate.isRegression(prev, cur, boxScale)

    // CONFIRMATION pass (r11 directive): every first-pass flag is
    // re-timed at END of run, after all 160 queries have churned the
    // block store — a flag that does not reproduce there was transient
    // environment (cache eviction, box burst), not a plan regression;
    // the r11 driver run flagged q_dedup_groups at 6.95 s that re-ran
    // at 0.40 on the same code. The published per-query time is the
    // min over ALL passes (the min-of-N protocol's definition of
    // steady state); confirmed flags are recomputed from that min, so
    // a flag survives only if it reproduced in the same run.
    val flaggedNames = (overFirst ++ regFirst).distinct.sorted
    if (flaggedNames.nonEmpty)
      System.err.println(s"[bench] confirming ${flaggedNames.size} " +
        s"first-pass flags: ${flaggedNames.mkString(",")}")
    val confirm: Map[String, Double] =
      flaggedNames.map(n => n -> exec(n)).toMap
    val finalResults = results.map { case (k, v) =>
      k -> (confirm.get(k) match {
        case Some(c) if v >= 0 && c >= 0 => math.min(v, c)
        case _ => v
      })
    }
    val overBudget = finalResults.collect { case (k, v) if v > 2.0 => k }
    val overTransient = overFirst.filterNot(overBudget.contains)
    // A flag survives when the published (min) time regresses — OR when
    // the CONFIRM pass alone does (ADVICE r12): publishing min over two
    // passes gives flagged queries a second sample unflagged ones never
    // get, so a regression that reproduces marginally on confirm could
    // duck under the gate via the min. If it reproduced, it's real.
    val regressed = finalResults.collect {
      case (k, v) if v >= 0 && prevQ.get(k).exists(p =>
          isRegression(p, v) ||
            confirm.get(k).exists(c => c >= 0 && isRegression(p, c))) =>
        (k, prevQ(k), v)
    }
    val regTransient = regFirst.filterNot(n => regressed.exists(_._1 == n))

    val qs = finalResults.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures (-1.0 markers) must NOT be summed — that would make a
    // broken build's total look FASTER; list them separately instead
    val failed = finalResults.collect { case (k, v) if v < 0 => k }
    val total = finalResults.map(_._2).filter(_ >= 0).sum
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def strArr(field: String, xs: Seq[String]): String =
      if (xs.isEmpty) s""","$field":[]"""
      else xs.map(n => "\"" + esc(n) + "\"")
        .mkString(s""","$field":[""", ",", "]")
    val failedField =
      if (failed.isEmpty) "" else strArr("failed", failed)
    val overField = strArr("over_budget", overBudget) +
      strArr("over_budget_transient", overTransient)
    // plain Double interpolation, NOT f"%.3f": the latter is
    // default-locale-sensitive and renders a decimal comma on e.g.
    // de_DE JVMs — malformed JSON
    // both pass times travel with every surviving flag (ADVICE r12), so
    // the report shows whether the regression held on the re-run too
    val regField = regressed.map { case (k, p, v) =>
      s"""{"name":"${esc(k)}","prev":$p,"cur":$v""" +
        s""","first":${results.toMap.apply(k)}""" +
        confirm.get(k).map(c => s""","confirm":$c""").getOrElse("") + "}"
    }.mkString(""","regressed":[""", ",", "]") +
      regTransient.map { n =>
        s"""{"name":"${esc(n)}","first":${results.toMap.apply(n)},"confirm":${confirm(n)}}"""
      }.mkString(""","regressed_transient":[""", ",", "]")
    val prewarmField =
      if (prewarmCapMb < 0) ""
      else s""","prewarm_overflow":$prewarmOverflow""" +
        s""","prewarm_cached_mem_mb":${math.round(prewarmMemMb)}""" +
        s""","prewarm_cached_disk_mb":${math.round(prewarmDiskMb)}""" +
        s""","prewarm_capacity_mb":${math.round(prewarmCapMb)}""" +
        s""","prewarm_n":${prewarmTimes.size}""" +
        prewarmTimes.map { case (n, t) => "\"" + esc(n) + "\":" + t }
          .mkString(""","prewarm_build_sec":{""", ",", "}")
    val annField =
      annDirEnv.map(r => s""","ann_dir":"${esc(r)}"""").getOrElse("")
    // calib (the run-START probe) travels with the report AND the
    // rolled snapshot (it is the denominator of the next run's box
    // scale); calib_confirm is the confirmation-pass probe and boxScale
    // documents what the confirmed flags were normalized by
    // (max-of-both — VERDICT r14 #4). rolled records whether this run
    // became the tier's comparison base (VERDICT r14 #2).
    val nFlags = overBudget.size + overTransient.size +
      regressed.size + regTransient.size
    // confirmed flags only — transients (including clamp-induced ones,
    // ADVICE r15 #3) do not block the workload roll path
    val nConfirmed = overBudget.size + regressed.size
    val rolled = BenchGate.shouldRoll(only.isEmpty, failed.size, nFlags,
      BenchGate.gateCalib(calib, calibConfirm), prevCalib,
      BenchGate.gateCalib(calibIo, calibIoConfirm), prevCalibIo,
      nConfirmed, medRatio)
    // median_ratio is the run's whole-workload speed vs the snapshot
    // (the signal that exposed the probe/workload decoupling) — absent
    // on subset runs with too few overlapping queries. NOTE (ADVICE
    // r15): it is computed from FIRST-pass times, the honest
    // box-weather read (confirm re-runs would bias flagged queries
    // fast), so it is deliberately NOT re-derivable from the published
    // per-query figures, which are min-over-passes.
    val calibField = s""","calib":$calib,"calib_confirm":$calibConfirm""" +
      s""","calib_io":$calibIo,"calib_io_confirm":$calibIoConfirm""" +
      s""","box_scale":$boxScale,"rolled":$rolled""" +
      medRatio.map(m => s""","median_ratio":$m""").getOrElse("")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$failedField$overField$regField$prewarmField$annField$calibField,"sf":"${esc(sfDir)}"}"""
    // stdout gets wrapped by sbt ("[info] {...}") and interleaved with log
    // noise, which made the round-1 report unparseable downstream — so the
    // authoritative copy goes to a file; stdout stays for humans.
    println(json)
    // The full per-query line above exceeds a 2000-char stdout tail
    // capture once ~90+ queries report, truncating it mid-JSON. Emit a
    // compact summary LAST so any tail window still contains one whole
    // parseable line (same metric/value as the full report).
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${names.size},""" +
        s""""n_failed":${failed.size},"n_over_budget":${overBudget.size},""" +
        s""""n_over_budget_transient":${overTransient.size},""" +
        s""""n_regressed":${regressed.size},""" +
        s""""n_regressed_transient":${regTransient.size},""" +
        s""""prewarm_overflow":$prewarmOverflow,"sf":"${esc(sfDir)}"}"""
    println(summary)
    val outPath = sys.env.getOrElse("BENCH_OUT",
      s"/root/repo/bench_${modePrefix}result.json")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // Roll the snapshot ONLY after a full-set, zero-failure, CALM run
    // (BenchGate.shouldRoll; VERDICT r14 #2) — and only into THIS
    // tier's per-tier file, so a subset/profiling run, a broken build,
    // a full run at another corpus tier, or a contended window (the r14
    // driver run rolled its 32-flag numbers into the baseline, muting
    // the next round's gate on exactly the noisiest queries) can never
    // become (or destroy) this tier's comparison base.
    if (rolled) {
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(prevPath),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not roll $prevPath: ${e.getMessage}")
      }
    } else if (only.isEmpty && failed.isEmpty)
      System.err.println(s"[bench] NOT rolling $prevPath ($nFlags flags " +
        s"of which $nConfirmed confirmed, " +
        f"gate calib ${BenchGate.gateCalib(calib, calibConfirm)}%.3f vs " +
        f"snapshot ${prevCalib.getOrElse(-1.0)}%.3f, io " +
        f"${BenchGate.gateCalib(calibIo, calibIoConfirm)}%.3f vs " +
        f"${prevCalibIo.getOrElse(-1.0)}%.3f, median ratio " +
        f"${medRatio.getOrElse(-1.0)}%.2f outside " +
        s"${BenchGate.WorkloadRollBand}): contended window; " +
        "prior snapshot kept")
    spark.stop()
  }
}
