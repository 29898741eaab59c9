package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series diagnostics over event streams. Shared by the x56 oracle
  * query and unit-testable on synthetic frames.
  *
  * Determinism contract (the g2 integer discipline): per-cell sums are
  * rounded ONCE (3 decimals) then moved to integer milli-units, so every
  * centered product and both Σ of the ACF estimator are exact integer
  * arithmetic — DECIMAL(38,0) sums on the Spark side, HUGEINT-summed
  * BIGINT in the DuckDB twin; the final num/den divide is the only
  * float operation, on identical correctly-rounded doubles in either
  * engine. */
object TimeSeries {

  /** Autocorrelation of each group's bucketed-volume series at lags
    * 1..3: r_k = Σ c_t·c_{t−k} / Σ c_t² with c = milli-unit value sum
    * minus the series' rounded mean, over the ZERO-FILLED dense grid
    * (gaps are real zeros — a sparse series would misalign the lag).
    *
    * Input needs (groupCol, tsSecCol, valueCol). Output: (groupCol,
    * n_hours, acf1, acf2, acf3); groups with zero variance are dropped
    * (their ACF is undefined).
    *
    * Scale shape: one (group, bucket) aggregation (the only data-sized
    * exchange), a broadcast 1-row bounds spine for the dense grid, one
    * group-partitioned lag window over grid-sized rows, one ≤|groups|-
    * row final aggregation. Grid length scales with the TIME SPAN, not
    * the event count. */
  def bucketAcf(events: DataFrame, groupCol: String, tsSecCol: String,
                valueCol: String, bucketSec: Long = 3600L): DataFrame = {
    val cells = events
      .select(col(groupCol), expr(s"$tsSecCol div $bucketSec").as("hr"),
        col(valueCol).as("__v"))
      .groupBy(groupCol, "hr").agg(round(sum("__v"), 3).as("v3"))
    val bounds = cells.agg(min("hr").as("h0"), max("hr").as("h1"))
    val dense = cells.select(groupCol).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(groupCol), explode(sequence(col("h0"), col("h1"))).as("hr"))
      .join(cells, Seq(groupCol, "hr"), "left_outer")
      .select(col(groupCol), col("hr"),
        round(coalesce(col("v3"), lit(0.0)) * 1000).cast("long").as("m"))
    val mu = dense.groupBy(groupCol)
      .agg(round(avg("m")).cast("long").as("mu"))
    val w = Window.partitionBy(groupCol).orderBy(col("hr").asc)
    val c = dense.join(mu, groupCol)
      .select(col(groupCol), col("hr"),
        (col("m") - col("mu")).cast("decimal(38,0)").as("c"))
      .withColumn("c1", lag("c", 1).over(w))
      .withColumn("c2", lag("c", 2).over(w))
      .withColumn("c3", lag("c", 3).over(w))
    c.groupBy(groupCol).agg(
        count(lit(1)).as("n_hours"),
        sum(col("c") * col("c")).as("den"),
        sum(col("c") * col("c1")).as("n1"),
        sum(col("c") * col("c2")).as("n2"),
        sum(col("c") * col("c3")).as("n3"))
      .filter(col("den") > 0)
      .select(col(groupCol), col("n_hours"),
        round(col("n1").cast("double") / col("den").cast("double"), 6).as("acf1"),
        round(col("n2").cast("double") / col("den").cast("double"), 6).as("acf2"),
        round(col("n3").cast("double") / col("den").cast("double"), 6).as("acf3"))
  }

  /** Rolling z-score anomalies with TIME-BUCKETED parallelism — the
    * scale path for the x53 shape, whose single per-group ordered
    * window bounds parallelism by group cardinality (the SCALE.md x53
    * caveat, solved here). Rows split into `bucketSec`-wide time
    * buckets per group; each bucket additionally receives the LAST
    * `depth` rows of its predecessor (the overlap carry), so every
    * row's depth-row look-back frame is complete inside its own
    * (group, bucket) partition and the window runs at group × bucket
    * parallelism. Carried rows compute nothing themselves (they only
    * fill frames) and every original row is emitted from exactly its
    * own bucket, so output ≡ the single-window form — row for row and
    * bit for bit (the frame is the identical row sequence, so even the
    * float sums match; spec-pinned on real data).
    *
    * PRECONDITION (the intervalJoin-style sizing contract): every
    * non-FIRST bucket of a group must hold ≥ `depth` rows — a frame may
    * span at most ONE bucket boundary, since the carry reaches exactly
    * one bucket back. Size `bucketSec` from known group density
    * (depth/rate plus slack). A violating (sparser) bucket silently
    * DROPS the early frames of its successor (they see n < depth) —
    * the spec demonstrates the honest bound. A short first bucket is
    * fine: its successor's early rows have fewer than `depth` true
    * predecessors and are dropped by both forms alike.
    *
    * Emission contract is exactly x53's: frames of exactly `depth`
    * rows, positive rounded variance, |z| > `zThresh`. */
  def rollingZScoreBucketed(events: DataFrame, groupCol: String,
                            tsSecCol: String, idCol: String, valueCol: String,
                            bucketSec: Long, depth: Int = 20,
                            zThresh: Double = 3.0): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    require(depth > 0, s"depth must be positive, got $depth")
    val base = events.select(col(groupCol).as("g"), col(tsSecCol).as("ts"),
        col(idCol).as("id"), col(valueCol).as("v"))
      .withColumn("bkt", expr(s"ts div $bucketSec"))
    val wLast = Window.partitionBy("g", "bkt")
      .orderBy(col("ts").desc, col("id").desc)
    val carry = base.withColumn("rn", row_number().over(wLast))
      .filter(col("rn") <= depth)
      .select(col("g"), col("ts"), col("id"), col("v"),
        (col("bkt") + 1).as("bkt"), lit(true).as("carry"))
    val f = Window.partitionBy("g", "bkt")
      .orderBy(col("ts").asc, col("id").asc)
      .rowsBetween(-depth, -1)
    base.withColumn("carry", lit(false))
      .select("g", "ts", "id", "v", "bkt", "carry")
      .unionByName(carry)
      .withColumn("n", count(lit(1)).over(f))
      .withColumn("sv", sum("v").over(f))
      .withColumn("sv2", sum(col("v") * col("v")).over(f))
      .filter(!col("carry") && col("n") === depth)
      .withColumn("mean", col("sv") / depth)
      .withColumn("varr", round(col("sv2") / depth - pow(col("mean"), 2), 6))
      .filter(col("varr") > 0)
      .withColumn("z", round((col("v") - col("mean")) / sqrt(col("varr")), 4))
      .filter(abs(col("z")) > zThresh)
      .select(col("g"), col("id"), col("ts"), col("v"), col("z"))
  }

  /** Holt's linear-trend exponential smoothing (Holt 1957; Hyndman &
    * Athanasopoulos, fpp3 §8.2 — public literature) over each group's
    * daily-bucketed value series:
    *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    * with the standard init l₁ = y₁, b₁ = y₂ − y₁, over OBSERVED days in
    * order (gaps are skipped, not zero-filled — this is the level/trend
    * readout of activity when it happens; zero-fill first if absence is
    * signal). Groups with fewer than two observed days are dropped
    * (the trend is undefined). Output per group: n_days, level, trend,
    * and the one-step forecast l + b, all in original value units.
    *
    * Cross-engine determinism: the recursion is genuinely sequential,
    * so every input is forced EXACT first — per-day sums in floor()'d
    * integer centi-units (order-independent BIGINT adds) — and α = 0.5,
    * β = 0.25 are binary-representable, making the whole trajectory a
    * fixed sequence of identically-ordered IEEE ops that a DuckDB
    * recursive CTE replays bit-for-bit; outputs are then rounded once.
    *
    * Scale shape: the (group, day) aggregation is the only data-sized
    * exchange; the fold runs inside `aggregate()` over one array row
    * per group, whose length is bounded by the TIME SPAN in days (a
    * few thousand for a decade), not the event count — per-group state
    * is (level, trend), never the raw events. */
  def holtLinear(events: DataFrame, groupCol: String, tsCol: String,
                 valueCol: String, alpha: Double = 0.5,
                 beta: Double = 0.25): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1,
      s"smoothing weights must be in (0,1], got alpha=$alpha beta=$beta")
    val daily = events
      .groupBy(col(groupCol), date_trunc("day", col(tsCol)).as("__day"))
      .agg(sum(floor(col(valueCol) * 100).cast("long")).as("__mu"))
    daily.groupBy(groupCol)
      .agg(array_sort(collect_list(struct(col("__day"), col("__mu")))).as("__s"))
      .filter(size(col("__s")) >= 2)
      // centi-units → exact doubles (day sums sit far below 2^53)
      .withColumn("__y", transform(col("__s"), e => e.getField("__mu").cast("double")))
      .withColumn("__st", aggregate(
        expr("slice(__y, 2, size(__y) - 1)"),
        struct(element_at(col("__y"), 1).as("l"),
          (element_at(col("__y"), 2) - element_at(col("__y"), 1)).as("b")),
        (acc, y) => {
          val l = acc.getField("l"); val b = acc.getField("b")
          val nl = lit(alpha) * y + lit(1.0 - alpha) * (l + b)
          struct(nl.as("l"),
            (lit(beta) * (nl - l) + lit(1.0 - beta) * b).as("b"))
        }))
      .select(col(groupCol), size(col("__y")).as("n_days"),
        round(col("__st.l") / 100.0, 6).as("level"),
        round(col("__st.b") / 100.0, 6).as("trend"),
        round((col("__st.l") + col("__st.b")) / 100.0, 6).as("forecast"))
  }

  /** Cross-correlation between TWO groups' bucketed-volume series at
    * lags −maxLag..maxLag: r(ℓ) = Σ a_t·b_{t+ℓ} / √(Σa²·Σb²) with both
    * series centered milli-unit grids over the SHARED global span (the
    * x56 discipline — gaps are real zeros, both series align on the
    * same dense hours). Positive ℓ means B LAGS A by ℓ buckets — the
    * "does A lead B" readout (clicks → purchases). Numerators are
    * exact decimal(38,0) per lag; the full-series normalization makes
    * r(ℓ) comparable across lags. Output: one row per lag, built from
    * a (2·maxLag+1)-row lag spine × the grid — span-sized work after
    * the one (group, bucket) aggregation. */
  def crossCorrelation(events: DataFrame, groupCol: String, tsSecCol: String,
                       valueCol: String, groupA: String, groupB: String,
                       maxLag: Int = 3, bucketSec: Long = 3600L): DataFrame = {
    val cells = events
      .filter(col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("g"), expr(s"$tsSecCol div $bucketSec").as("hr"),
        col(valueCol).as("__v"))
      .groupBy("g", "hr").agg(round(sum("__v"), 3).as("v3"))
    val bounds = cells.agg(min("hr").as("h0"), max("hr").as("h1"))
    val dense = cells.select("g").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("g"), explode(sequence(col("h0"), col("h1"))).as("hr"))
      .join(cells, Seq("g", "hr"), "left_outer")
      .select(col("g"), col("hr"),
        round(coalesce(col("v3"), lit(0.0)) * 1000).cast("long").as("m"))
    val mu = dense.groupBy("g").agg(round(avg("m")).cast("long").as("mu"))
    val cgrid = dense.join(mu, "g")
      .select(col("g"), col("hr"),
        (col("m") - col("mu")).cast("decimal(38,0)").as("c"))
    val a = cgrid.filter(col("g") === groupA)
      .select(col("hr"), col("c").as("ca"))
    val b = cgrid.filter(col("g") === groupB)
      .select(col("hr").as("hrb"), col("c").as("cb"))
    val den = a.agg(sum(col("ca") * col("ca")).as("sa"))
      .crossJoin(b.agg(sum(col("cb") * col("cb")).as("sb")))
    val lags = a.sparkSession.range(-maxLag, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    a.crossJoin(broadcast(lags))
      .join(b, col("hrb") === col("hr") + col("lag"))
      .groupBy("lag").agg(sum(col("ca") * col("cb")).as("num"))
      .crossJoin(broadcast(den))
      .filter(col("sa") > 0 && col("sb") > 0)
      .select(col("lag"),
        round(col("num").cast("double") /
          sqrt(col("sa").cast("double") * col("sb").cast("double")), 6)
          .as("ccf"))
  }

  /** Partial autocorrelation at lags 1–3 via the Durbin–Levinson
    * closed forms over [[bucketAcf]]'s r₁..r₃ — the AR-order
    * fingerprint next to the plain ACF (an AR(p) series cuts off after
    * lag p in PACF where the ACF only decays):
    *
    *   φ₁₁ = r₁
    *   φ₂₂ = (r₂ − r₁²) / (1 − r₁²)
    *   φ₃₃ = (r₃ − φ₂₁r₂ − φ₂₂r₁) / (1 − φ₂₁r₁ − φ₂₂r₂),  φ₂₁ = r₁(1 − φ₂₂)
    *
    * Arithmetic runs on the ROUNDED acf columns (both engines start
    * from identical 6-decimal inputs, so the recursion can't fork);
    * degenerate denominators (|r₁| = 1 alternation) read NULL. Adds
    * |groups| rows of arithmetic to the ACF plan — nothing else. */
  def bucketPacf(events: DataFrame, groupCol: String, tsSecCol: String,
                 valueCol: String, bucketSec: Long = 3600L): DataFrame = {
    val acf = bucketAcf(events, groupCol, tsSecCol, valueCol, bucketSec)
    val r1 = col("acf1"); val r2 = col("acf2"); val r3 = col("acf3")
    val p22 = (r2 - r1 * r1) / nullif(lit(1.0) - r1 * r1, lit(0.0))
    val p21 = r1 * (lit(1.0) - p22)
    val p33 = (r3 - p21 * r2 - p22 * r1) /
      nullif(lit(1.0) - p21 * r1 - p22 * r2, lit(0.0))
    acf.select(col(groupCol), col("n_hours"),
      r1.as("pacf1"), round(p22, 6).as("pacf2"), round(p33, 6).as("pacf3"))
  }

  /** Single best changepoint per group's daily-volume series — binary
    * segmentation's first step. For every split t of the ZERO-FILLED
    * dense grid (1 ≤ t < n), the between-segment sum-of-squares gain is
    * gain(t) = (n·S_t − t·S_n)² / (t·(n−t)·n) with S the milli-unit
    * prefix sum; the argmax (earliest day on ties) is the changepoint.
    * The numerator stays an EXACT integer (decimal(38,0)) so the
    * ordering never forks on float summation; only the final ratio and
    * the reported means divide.
    *
    * Scale shape: one (group, day) aggregation, the broadcast bounds
    * spine for the dense grid, ONE group-partitioned ordered window
    * (prefix sums ride it), and a group-keyed argmax aggregation over
    * grid-sized rows — everything past the first aggregation scales
    * with the time span, not the event count. */
  def changepoint(events: DataFrame, groupCol: String, tsSecCol: String,
                  valueCol: String, bucketSec: Long = 86400L): DataFrame =
    changepointFromCells(
      events
        .select(col(groupCol), expr(s"$tsSecCol div $bucketSec").as("day"),
          col(valueCol).as("__v"))
        .groupBy(groupCol, "day").agg(round(sum("__v"), 3).as("v3"))
        .select(col(groupCol), col("day"),
          round(col("v3") * 1000).cast("long").as("m")),
      groupCol)

  /** The changepoint readout over a PRE-AGGREGATED sparse cell table
    * (groupCol, day, m) with m the exact milli-unit day sum — the
    * entry point the streaming maintainer
    * ([[graft.streaming.StreamDailyCells]]) shares with the batch
    * path, so "view ≡ recompute" is a theorem about one function. */
  def changepointFromCells(cells: DataFrame, groupCol: String): DataFrame = {
    val bounds = cells.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = cells.select(groupCol).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(groupCol), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(cells, Seq(groupCol, "day"), "left_outer")
      .select(col(groupCol), col("day"),
        coalesce(col("m"), lit(0L)).as("m"))
    val w = Window.partitionBy(groupCol).orderBy(col("day").asc)
    val pre = dense
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("st", sum("m").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .withColumn("sn", sum("m").over(Window.partitionBy(groupCol)))
      .filter(col("t") < col("n"))
    val num = (col("n").cast("decimal(38,0)") * col("st") -
      col("t").cast("decimal(38,0)") * col("sn")).cast("double")
    val scored = pre.select(col(groupCol), col("day"), col("t"), col("n"),
      col("st"), col("sn"),
      (num * num /
        (col("t") * (col("n") - col("t")) * col("n")).cast("double")).as("gain"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("gain").desc, col("t").asc)))
      .filter(col("rk") === 1)
      // means quantize to milli-units in INTEGER round-half-up
      // ((2a+b) div 2b) — a double division only happens once, on a
      // ≤3-decimal value, so the final rounding can never sit on a
      // half-up boundary (the x112 sf0.01 3031.93875 incident)
      .select(col(groupCol), col("n").as("n_days"), col("day").as("cp_day"),
        (expr("(2*st + t) div (2*t)").cast("double") / 1000.0).as("mean_before"),
        (expr("(2*(sn - st) + (n - t)) div (2*(n - t))").cast("double") / 1000.0)
          .as("mean_after"),
        round(col("gain") / 1e6, 4).as("gain"))
  }

  /** SAX symbolization of each group's daily-volume series: the dense
    * milli-unit grid z-normalizes against the series' own mean/σ
    * (population), averages into `segments` PAA frames (day d joins
    * frame ⌊d·w/n⌋ — the integer-partition PAA), and each frame mean
    * maps through the Gaussian quartile breakpoints (−0.6745, 0,
    * 0.6745) to one of {a, b, c, d}. Output: one symbol string per
    * group — the index key for whole-series similarity at scale (equal
    * strings ⇒ similar shape, compared in w chars instead of n days).
    *
    * Same scale shape as [[changepoint]]: past the (group, day)
    * aggregation everything is grid-sized; the symbol concat is a
    * sorted struct collect over w ≤ `segments` rows per group. Flat
    * (zero-σ) series are dropped — their z-grid is undefined. */
  def saxSymbols(events: DataFrame, groupCol: String, tsSecCol: String,
                 valueCol: String, segments: Int = 8,
                 bucketSec: Long = 86400L): DataFrame = {
    val cells = events
      .select(col(groupCol), expr(s"$tsSecCol div $bucketSec").as("day"),
        col(valueCol).as("__v"))
      .groupBy(groupCol, "day").agg(round(sum("__v"), 3).as("v3"))
    val bounds = cells.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = cells.select(groupCol).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(groupCol), explode(sequence(col("d0"), col("d1"))).as("day"),
        col("d0"))
      .join(cells, Seq(groupCol, "day"), "left_outer")
      .select(col(groupCol), (col("day") - col("d0")).as("i"),
        round(coalesce(col("v3"), lit(0.0)) * 1000).cast("long").as("m"))
    // all sufficient statistics are EXACT integer sums (Σm in long,
    // Σm² in decimal(38,0)), so μ, σ², and every frame mean are single
    // fixed expression trees over exact inputs — no float-summation
    // order for the two engines to disagree on
    val stats = dense.groupBy(groupCol).agg(
      count(lit(1)).as("n"), sum("m").as("s"),
      sum(col("m").cast("decimal(38,0)") * col("m")).as("s2"))
    val mu = col("s").cast("double") / col("n")
    val varp = col("s2").cast("double") / col("n") - mu * mu
    val paa = dense.join(stats, groupCol)
      .filter(varp > 0)
      .select(col(groupCol), col("n"), col("s"), col("s2"),
        floor(col("i") * segments / col("n")).cast("int").as("seg"), col("m"))
      .groupBy(groupCol, "seg")
      .agg(first("n").as("n"), first("s").as("s"), first("s2").as("s2"),
        count(lit(1)).as("cnt"), sum("m").as("sm"))
      .select(col(groupCol), col("n"), col("seg"),
        ((col("sm").cast("double") / col("cnt") - mu) / sqrt(varp)).as("pz"))
    paa
      .select(col(groupCol), col("n"), col("seg"),
        when(col("pz") < -0.6745, "a").when(col("pz") < 0.0, "b")
          .when(col("pz") < 0.6745, "c").otherwise("d").as("sym"))
      .groupBy(groupCol)
      .agg(first("n").as("n_days"),
        array_join(transform(
          array_sort(collect_list(struct(col("seg"), col("sym")))),
          e => e.getField("sym")), "").as("sax"))
  }

  /** Haar wavelet top-k detail coefficients of each group's daily
    * series — the multi-resolution "where and at what scale does this
    * series move" readout (wavelet compression / anomaly localization:
    * a big |detail| at level ℓ, position p marks a change of scale 2^ℓ
    * days around day p·2^ℓ). The UNNORMALIZED sum/difference pyramid
    * (s = a+b, d = a−b per pair) keeps every coefficient an EXACT
    * integer in milli-units — the x53/x65 exactness discipline — and
    * the per-group ranking (|detail| desc, level asc, pos asc) is then
    * engine-stable; divide by 2^(ℓ/2) downstream when orthonormal
    * values are wanted.
    *
    * Scale shape: ONE keyed aggregation over events, then `levels`
    * halving aggregations + a top-k window over grid-sized rows
    * (2^levels per group) — everything past the first aggregation is
    * span-bound, not event-bound, exactly the [[changepoint]] contract.
    * The dyadic window is the first 2^levels days from the global min
    * day; later days fall outside the transform by definition. */
  def haarTopDetails(events: DataFrame, groupCol: String, tsSecCol: String,
                     valueCol: String, levels: Int = 5, k: Int = 5,
                     bucketSec: Long = 86400L): DataFrame =
    haarFromCells(
      events
        .select(col(groupCol), expr(s"$tsSecCol div $bucketSec").as("day"),
          col(valueCol).as("__v"))
        .groupBy(groupCol, "day").agg(round(sum("__v"), 3).as("v3"))
        .select(col(groupCol), col("day"),
          round(col("v3") * 1000).cast("long").as("m")),
      groupCol, levels, k)

  /** The Haar readout over a PRE-AGGREGATED sparse cell table
    * (groupCol, day, m) — the same [[changepointFromCells]] entry point
    * the streaming maintainer ([[graft.streaming.StreamDailyCells]])
    * shares with the batch path, so "wavelet readout over the live view
    * ≡ batch readout over raw events" is a theorem about one
    * function. */
  def haarFromCells(cells: DataFrame, groupCol: String,
                    levels: Int = 5, k: Int = 5): DataFrame = {
    require(levels >= 1 && levels <= 20, s"levels out of range: $levels")
    val n = 1 << levels
    val bounds = cells.agg(min("day").as("d0"))
    // dense dyadic grid 0..2^levels−1, zero-filled (the x112/x113 grid)
    var level = cells.select(groupCol).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(groupCol), explode(sequence(lit(0), lit(n - 1))).as("pos"),
        col("d0"))
      .join(cells.crossJoin(broadcast(bounds))
          .select(col(groupCol), (col("day") - col("d0")).as("pos"), col("m")),
        Seq(groupCol, "pos"), "left_outer")
      .select(col(groupCol), col("pos"),
        coalesce(col("m"), lit(0L)).as("m"))
      // snapshot the grid (the d7/g10 iterated-chain discipline): every
      // level branches TWICE (its detail rows + the next level), so an
      // unsnapshotted lineage re-derives the whole events aggregation
      // 2^levels times — 40 fact-table scans, plan-audited. Grid and
      // per-level tables are groups × 2^levels rows: snapshot-cheap.
      .localCheckpoint(false)
    var details: DataFrame = null
    for (l <- 1 to levels) {
      val folded = level
        // "ppos", not "pos": the agg's even/odd sign test must resolve
        // unambiguously against the CHILD's position column
        .groupBy(col(groupCol), (col("pos") / 2).cast("long").as("ppos"))
        .agg(sum(when(col("pos") % 2 === 0, col("m")).otherwise(-col("m")))
            .as("detail"),
          sum("m").as("m"))
        .withColumnRenamed("ppos", "pos")
        .localCheckpoint(false)
      val d = folded.select(col(groupCol), lit(l).as("level"), col("pos"),
        col("detail"))
      details = if (details == null) d else details.unionByName(d)
      level = folded.select(col(groupCol), col("pos"), col("m"))
    }
    val w = Window.partitionBy(groupCol)
      .orderBy(abs(col("detail")).desc, col("level").asc, col("pos").asc)
    details
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank"), col("level"),
        col("pos").cast("int").as("pos"), col("detail"))
  }
}
