package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** ANALYZE-style data profiling — the stats pass every engine (and every
  * corpus-curation decision) runs before anything else: per-group row
  * counts, null counts, distinct cardinalities, and value ranges.
  */
object Profile {

  /** Per-lang profile of the documents table: one pass, one shuffle on
    * the group key with map-side partial aggregation. All-integer
    * output (no float aggregates → no association-order hash hazards).
    *
    * Scale: the exact `countDistinct` rewrites to a two-phase expand +
    * aggregate — fine while per-group distinct sources are bounded (they
    * are: sources is a small enum). For a genuinely high-cardinality
    * column at 100 TB the one-token swap is `approx_count_distinct`
    * (HLL, fixed-size sketch state), the same trade `q_approx_distinct`
    * demonstrates and oracle-bounds.
    */
  def statsProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"source").as("n_sources"),
        sum($"text".isNull.cast("long")).as("null_text"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"),
        sum($"n_chars").as("sum_chars"),
        min(length($"text")).cast("long").as("min_len"),
        max(length($"text")).cast("long").as("max_len"))
  }

  val statsProfileSql: String = """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(length(text)) AS BIGINT) AS min_len,
           CAST(MAX(length(text)) AS BIGINT) AS max_len
    FROM documents
    GROUP BY lang"""

  /** Pearson correlation of (l_quantity, l_extendedprice) from EXACT
    * integer moments: quantities are integral and prices round to whole
    * dollars, so every sufficient statistic (n, Σx, Σy, Σx², Σy², Σxy)
    * is an order-independent BIGINT — one map-side-combined aggregation,
    * hash-identical under any partitioning/engine. The correlation
    * itself is derived from those integers by one FIXED double
    * expression (cast-then-arithmetic, same tree both engines), not by
    * a float aggregate — the trick that makes a statistically
    * meaningful float column safely hash-comparable.
    *
    * The dollar scale is deliberate: it keeps every moment below 2^53,
    * so the int→double casts in the derivation are EXACT on both
    * engines (a cents-scaled Σy² crossed 2^53 and the two engines'
    * decimal→double rounding disagreed by 1 ulp — measured at sf0.1).
    * At corpus scales where a moment would cross 2^53, the play is
    * decimal moments + emitting the ratio at reduced precision, or
    * centering by a first-pass mean; the sub-2^53 contract keeps this
    * operator bit-exact.
    *
    * Scale: a single scan + one 1-row aggregate; this is how a 100 TB
    * profiler computes correlation matrices (k² integer columns in one
    * pass), not via per-pair `corr()` floats whose merge order varies.
    */
  def statsCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select(round($"l_quantity").cast("long").as("x"),
        round($"l_extendedprice").cast("long").as("y"))
    val m = li.agg(
      count(lit(1)).as("n"),
      sum($"x").as("sum_x"), sum($"y").as("sum_y"),
      sum($"x" * $"x").as("sum_xx"),
      sum($"y" * $"y").as("sum_yy"),
      sum($"x" * $"y").as("sum_xy"))
    m.select($"n", $"sum_x", $"sum_y", $"sum_xx", $"sum_yy", $"sum_xy",
      (($"n".cast("double") * $"sum_xy".cast("double") -
        $"sum_x".cast("double") * $"sum_y".cast("double")) /
        (sqrt($"n".cast("double") * $"sum_xx".cast("double") -
          $"sum_x".cast("double") * $"sum_x".cast("double")) *
         sqrt($"n".cast("double") * $"sum_yy".cast("double") -
           $"sum_y".cast("double") * $"sum_y".cast("double")))).as("corr"))
  }

  val statsCorrSql: String = """
    WITH s AS (SELECT CAST(round(l_quantity) AS BIGINT) AS x,
                      CAST(round(l_extendedprice) AS BIGINT) AS y
               FROM lineitem),
    m AS (SELECT COUNT(*) AS n,
                 CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
                 CAST(SUM(x * x) AS BIGINT) AS sum_xx,
                 CAST(SUM(y * y) AS BIGINT) AS sum_yy,
                 CAST(SUM(x * y) AS BIGINT) AS sum_xy
          FROM s)
    SELECT n, sum_x, sum_y, sum_xx, sum_yy, sum_xy,
           (CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE) -
            CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE)) /
           (sqrt(CAST(n AS DOUBLE) * CAST(sum_xx AS DOUBLE) -
                 CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE)) *
            sqrt(CAST(n AS DOUBLE) * CAST(sum_yy AS DOUBLE) -
                 CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE))) AS corr
    FROM m"""

  /** Welch's two-sample t statistic (click vs purchase event values) from
    * EXACT integer moments — the A/B-experiment readout computed the way
    * a 100 TB profiler does it: ONE conditional-aggregation pass
    * producing the six sufficient statistics (n, Σx, Σx² per group) as
    * order-independent BIGINTs on a cents scale, then mean / sample
    * variance / t derived by fixed double expressions (identical trees
    * both engines — the [[statsCorr]] device). No per-group float
    * aggregates, no second scan, nothing at the driver.
    *
    * Cents keep every moment far below 2^53 at gate scales (values are
    * O(100), squares O(1e8), × O(1e5) rows ≈ 1e13), so the int→double
    * casts are exact and the output hash-matches.
    */
  def statsTtest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_type", round($"value" * 100).cast("long").as("x"))
    val isA = $"event_type" === "click"
    val m = ev.agg(
      sum(when(isA, 1L).otherwise(0L)).as("n_a"),
      sum(when(isA, $"x").otherwise(0L)).as("sx_a"),
      sum(when(isA, $"x" * $"x").otherwise(0L)).as("sxx_a"),
      sum(when(!isA, 1L).otherwise(0L)).as("n_b"),
      sum(when(!isA, $"x").otherwise(0L)).as("sx_b"),
      sum(when(!isA, $"x" * $"x").otherwise(0L)).as("sxx_b"))
    def mean(sx: String, n: String) =
      col(sx).cast("double") / col(n).cast("double")
    def svar(n: String, sxx: String, sx: String) =
      (col(n).cast("double") * col(sxx).cast("double") -
        col(sx).cast("double") * col(sx).cast("double")) /
        (col(n).cast("double") * (col(n).cast("double") - lit(1.0)))
    m.select($"n_a", $"n_b", $"sx_a", $"sx_b", $"sxx_a", $"sxx_b",
      mean("sx_a", "n_a").as("mean_a"),
      mean("sx_b", "n_b").as("mean_b"),
      ((mean("sx_a", "n_a") - mean("sx_b", "n_b")) /
        sqrt(svar("n_a", "sxx_a", "sx_a") / $"n_a".cast("double") +
          svar("n_b", "sxx_b", "sx_b") / $"n_b".cast("double"))).as("t_welch"))
  }

  /** Split drift monitor: total-variation distance between the train
    * and val splits' SOURCE distributions — the check a pipeline runs
    * before trusting a validation set (a drifted val split silently
    * invalidates every eval). TV = ½·Σ_s |p_train(s) − p_val(s)|,
    * computed from EXACT integers: per-source counts cross-multiplied
    * against the opposite split's total (|n_t·N_v − n_v·N_t| — an
    * order-independent BIGINT sum, ≪ 2^53 at gate scales), with ONE
    * final double division. The usual PSI carries a transcendental ln
    * whose last ulp differs between JVM and libm (the `text_cooccur`
    * lesson), so the hash-compared contract stays log-free; TV is the
    * standard distance with the same monitoring role.
    *
    * Scale: one conditional-aggregation pass onto source-cardinality
    * rows, a 1-row totals broadcast, and a constant-size final fold.
    */
  def statsDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Curation.trainValTestSplit(spark, dir)
      .filter($"split".isin("train", "val"))
      .groupBy($"source")
      .agg(sum(when($"split" === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when($"split" === "val", 1L).otherwise(0L)).as("n_val"))
    val tot = counts.agg(sum($"n_train").as("na"), sum($"n_val").as("nb"))
    counts.crossJoin(broadcast(tot))
      .select($"na", $"nb",
        abs($"n_train" * $"nb" - $"n_val" * $"na").as("ct"))
      .groupBy($"na", $"nb")
      .agg(sum($"ct").as("sum_cross"))
      .select($"na", $"nb", $"sum_cross",
        ((lit(0.5) * $"sum_cross".cast("double")) /
          ($"na".cast("double") * $"nb".cast("double"))).as("tv_dist"))
  }

  val statsDriftSql: String = {
    val trainEnd = f"${(0.90 * (1L << 32)).toLong}%08x"
    val valEnd = f"${(0.95 * (1L << 32)).toLong}%08x"
    s"""
    WITH sp AS (
      SELECT source,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$trainEnd' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$valEnd' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents),
    c AS (SELECT source,
            CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
            CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val
          FROM sp WHERE split IN ('train', 'val') GROUP BY 1),
    t AS (SELECT CAST(SUM(n_train) AS BIGINT) AS na,
                 CAST(SUM(n_val) AS BIGINT) AS nb FROM c)
    SELECT na, nb,
           CAST(SUM(abs(n_train * nb - n_val * na)) AS BIGINT) AS sum_cross,
           0.5 * CAST(CAST(SUM(abs(n_train * nb - n_val * na)) AS BIGINT) AS DOUBLE) /
           (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS tv_dist
    FROM c, t GROUP BY na, nb"""
  }

  val statsTtestSql: String = """
    WITH s AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
               FROM events WHERE event_type IN ('click', 'purchase')),
    m AS (SELECT
            CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN event_type = 'click' THEN x ELSE 0 END) AS BIGINT) AS sx_a,
            CAST(SUM(CASE WHEN event_type = 'click' THEN x * x ELSE 0 END) AS BIGINT) AS sxx_a,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN x ELSE 0 END) AS BIGINT) AS sx_b,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN x * x ELSE 0 END) AS BIGINT) AS sxx_b
          FROM s)
    SELECT n_a, n_b, sx_a, sx_b, sxx_a, sxx_b,
           CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
           CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
           (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
            CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
           sqrt((CAST(n_a AS DOUBLE) * CAST(sxx_a AS DOUBLE) -
                 CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE)) /
                (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)) /
                CAST(n_a AS DOUBLE) +
                (CAST(n_b AS DOUBLE) * CAST(sxx_b AS DOUBLE) -
                 CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE)) /
                (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)) /
                CAST(n_b AS DOUBLE)) AS t_welch
    FROM m"""

  /** Median absolute deviation of order totals — the ROBUST scale
    * estimate next to [[statsCorr]]'s moment-based spread (one extreme
    * order can move a standard deviation arbitrarily; the MAD moves only
    * when half the mass does — the robust-outlier gate a profiler runs
    * before trusting z-scores).
    *
    * MAD is a two-level order statistic, so two passes are inherent:
    * exact distributed `percentile` for the median (bit-identical to
    * DuckDB `quantile_cont` — proven by `q_quantile`), the 1-row median
    * broadcast into a second scan computing deviations, then `percentile`
    * again. Values in exact integer cents; both emitted columns are the
    * interpolated doubles both engines derive identically. At 100 TB the
    * documented swap is `approx_percentile` on both levels (the
    * rank-error-bounded sketch `q_quantile`'s spec already bounds).
    */
  def statsMad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = Tables.orders(spark, dir)
      .select(round($"o_totalprice" * 100).cast("long").as("cents"))
    val med = cents.agg(expr("percentile(cents, 0.5)").as("med"))
    cents.crossJoin(broadcast(med))
      .select($"med", abs($"cents" - $"med").as("dev"))
      .agg(max($"med").as("median_cents"),
        expr("percentile(dev, 0.5)").as("mad_cents"))
  }

  val statsMadSql: String = """
    WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders),
    m AS (SELECT quantile_cont(cents, 0.5) AS med FROM c)
    SELECT max(med) AS median_cents,
           quantile_cont(abs(cents - med), 0.5) AS mad_cents
    FROM c, m"""

  /** Robust outlier gate — orders more than k·MAD from the median
    * (the alerting rule [[statsMad]] exists to feed: unlike z-scores,
    * the threshold itself cannot be dragged by the outliers it hunts).
    * Heavy-tailed production data gates at k ≈ 3–10; this corpus's
    * prices are uniform-ish (max deviation ≈ 2·MAD), so the default
    * sits at 1.9 to actually exercise the tail (~0.5% of orders at
    * sf0.01). The two 1-row robust statistics broadcast into one final
    * scan — three passes total, each a full scan + tiny agg, nothing
    * ever keyed by more than the 1-row stats frame.
    */
  def outliersMad(spark: SparkSession, dir: String, k: Double = 1.9): DataFrame = {
    import spark.implicits._
    val stats = statsMad(spark, dir)
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .crossJoin(broadcast(stats))
      .filter(abs($"cents" - $"median_cents") > lit(k) * $"mad_cents")
      .select($"o_orderkey", $"cents",
        (($"cents" - $"median_cents") / $"mad_cents").as("mad_score"))
  }

  /** Oracle for [[outliersMad]] — the threshold derives from the same k
    * parameter as the query, so a non-default call can't silently
    * desync query from oracle.
    */
  def outliersMadSql(k: Double = 1.9): String = s"""
    WITH c AS (SELECT o_orderkey,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders),
    m AS (SELECT quantile_cont(cents, 0.5) AS med FROM c),
    s AS (SELECT max(med) AS median_cents,
                 quantile_cont(abs(cents - med), 0.5) AS mad_cents
          FROM c, m)
    SELECT o_orderkey, cents,
           (cents - median_cents) / mad_cents AS mad_score
    FROM c, s
    WHERE abs(cents - median_cents) > ${k}e0 * mad_cents"""

  /** Two-sample Kolmogorov–Smirnov drift statistic — the
    * DISTRIBUTION-level companion of [[statsTtest]]'s mean test and
    * [[statsDrift]]'s categorical total-variation: did an experiment
    * arm (users split by id parity — the A/B shape) shift the whole
    * click-value distribution, not just its mean? D = max over the
    * value grid of |ECDF_A − ECDF_B|.
    *
    * Exactness device: values compare on the integer CENTS grid
    * (round(value·100) — the same scaled-integer move as the moment
    * statistics), so per-grid-point counts are exact BIGINTs and
    * D = max |ca·nb − cb·na| / (na·nb) is computed as an integer
    * numerator with ONE final double division — engine-exact hash.
    *
    * Scale shape: one groupBy on the BOUNDED cents grid (domain-sized,
    * not corpus-sized — ~10⁵ distinct points regardless of row count),
    * then one ordered window over that bounded grid for the cumulative
    * counts; the corpus-sized input only ever passes through the
    * map-side-combined grid aggregation. At an unbounded value domain
    * the documented swap is a fixed-width binned ECDF (the
    * `q_histogram` grid) — same query shape.
    */
  def statsKs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val vals = Tables.events(spark, dir)
      .filter($"event_type" === "click" && $"value".isNotNull)
      .select(($"user_id" % 2).as("g"), round($"value" * 100).cast("long").as("cents"))
    val grid = vals.groupBy($"cents")
      .agg(sum(when($"g" === 0, 1L).otherwise(0L)).as("a"),
        sum(when($"g" === 1, 1L).otherwise(0L)).as("b"))
    val w = Window.orderBy($"cents").rowsBetween(Window.unboundedPreceding, 0)
    val cum = grid.select($"cents", sum($"a").over(w).as("ca"), sum($"b").over(w).as("cb"))
    val tot = grid.agg(sum($"a").as("na"), sum($"b").as("nb"))
    cum.crossJoin(broadcast(tot))
      // Degenerate-input guard: an empty parity arm makes na·nb = 0 and
      // D undefined (and Spark/DuckDB disagree on 0/0) — emit no row.
      .filter($"na" > 0 && $"nb" > 0)
      .select($"na", $"nb", abs($"ca" * $"nb" - $"cb" * $"na").as("dn"))
      .groupBy($"na", $"nb")
      .agg(max($"dn").as("d_num"))
      .select($"na", $"nb", $"d_num",
        ($"d_num".cast("double") / ($"na".cast("double") * $"nb".cast("double"))).as("ks_d"))
  }

  val statsKsSql: String = """
    WITH v AS (
      SELECT user_id % 2 AS g, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'click' AND value IS NOT NULL),
    grid AS (
      SELECT cents,
             CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM v GROUP BY 1),
    cum AS (
      SELECT cents,
             SUM(a) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS ca,
             SUM(b) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cb
      FROM grid),
    t AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb FROM grid)
    SELECT na, nb, CAST(MAX(abs(ca * nb - cb * na)) AS BIGINT) AS d_num,
           CAST(MAX(abs(ca * nb - cb * na)) AS DOUBLE) /
           (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks_d
    FROM cum, t WHERE na > 0 AND nb > 0 GROUP BY na, nb"""

  /** [[statsKs]]'s documented unbounded-domain swap, shipped: the
    * BINNED-ECDF two-sample KS. The exact row's ordered window runs over
    * the distinct-cents grid — bounded for cents, but a value domain
    * with unbounded cardinality (timings, hashes, free floats) would
    * make that grid corpus-sized and the single ordered window a
    * bottleneck. Binning to fixed-width buckets (`widthCents`, default
    * $1) caps the grid at range/width rows INDEPENDENT of value
    * cardinality; the corpus-sized input still only ever passes through
    * the map-side-combined bin aggregation.
    *
    * What binning costs is resolution, and the row makes that cost an
    * exact bracket instead of a silent approximation: evaluating the
    * ECDF gap only at bin BOUNDARIES lower-bounds D, and inside a bin
    * the gap can exceed the boundary value by at most that bin's
    * probability mass in each arm, so
    *   D_lower = max_bins |CA·nb − CB·na| / (na·nb)
    *   D_upper = D_lower + max_bins (a·nb + b·na) / (na·nb)
    * bracket the exact statistic. Both numerators are exact BIGINTs on
    * the same integer-cents grid as [[statsKs]] (one double division at
    * the end), so the hash oracle is engine-exact, and the spec pins the
    * bracket against the exact row ([[statsKs]] ∈ [lower, upper]) plus
    * width=1 degeneracy (the lower bound equals the exact D — every
    * bin is a single grid point).
    */
  def statsKsBinned(spark: SparkSession, dir: String, widthCents: Long = 100L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val vals = Tables.events(spark, dir)
      .filter($"event_type" === "click" && $"value".isNotNull)
      .select(($"user_id" % 2).as("g"),
        floor(round($"value" * 100).cast("long") / widthCents).as("bin"))
    val grid = vals.groupBy($"bin")
      .agg(sum(when($"g" === 0, 1L).otherwise(0L)).as("a"),
        sum(when($"g" === 1, 1L).otherwise(0L)).as("b"))
    val w = Window.orderBy($"bin").rowsBetween(Window.unboundedPreceding, 0)
    val cum = grid.select($"a", $"b",
      sum($"a").over(w).as("ca"), sum($"b").over(w).as("cb"))
    val tot = grid.agg(sum($"a").as("na"), sum($"b").as("nb"))
    cum.crossJoin(broadcast(tot))
      .filter($"na" > 0 && $"nb" > 0)
      .select($"na", $"nb", abs($"ca" * $"nb" - $"cb" * $"na").as("dn"),
        ($"a" * $"nb" + $"b" * $"na").as("mass"))
      .groupBy($"na", $"nb")
      .agg(max($"dn").as("d_num"), max($"mass").as("err_num"))
      .select($"na", $"nb", $"d_num", $"err_num",
        ($"d_num".cast("double") /
          ($"na".cast("double") * $"nb".cast("double"))).as("ks_d_lower"),
        (($"d_num" + $"err_num").cast("double") /
          ($"na".cast("double") * $"nb".cast("double"))).as("ks_d_upper"))
  }

  def statsKsBinnedSql(widthCents: Long = 100L): String = s"""
    WITH v AS (
      SELECT user_id % 2 AS g,
             CAST(floor(CAST(round(value * 100) AS BIGINT) / ${widthCents}.0) AS BIGINT) AS bin
      FROM events WHERE event_type = 'click' AND value IS NOT NULL),
    grid AS (
      SELECT bin,
             CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM v GROUP BY 1),
    cum AS (
      SELECT a, b,
             SUM(a) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS ca,
             SUM(b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cb
      FROM grid),
    t AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb FROM grid)
    SELECT na, nb, CAST(MAX(abs(ca * nb - cb * na)) AS BIGINT) AS d_num,
           CAST(MAX(a * nb + b * na) AS BIGINT) AS err_num,
           CAST(MAX(abs(ca * nb - cb * na)) AS DOUBLE) /
           (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks_d_lower,
           CAST(MAX(abs(ca * nb - cb * na)) + MAX(a * nb + b * na) AS DOUBLE) /
           (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks_d_upper
    FROM cum, t WHERE na > 0 AND nb > 0 GROUP BY na, nb"""

  /** Exact ROC-AUC of the trained quality model's scores against its
    * labels — the evaluation a model gate ships with (is the classifier
    * actually ranking curated provenance above the rest?). AUC is the
    * Mann–Whitney statistic: P(score_pos > score_neg) + ½·P(tie),
    * computed EXACTLY on the integer score grid —
    *   auc_num = Σ_scores p·(2·negatives_strictly_below) + p·n_ties
    *   auc     = auc_num / (2·n_pos·n_neg)
    * with every numerator an exact BIGINT (the [[statsKs]] device: one
    * map-side-combined groupBy on the score grid + one ordered window
    * over the grid, one double division at the end — engine-exact
    * hash). The grid is distinct-score-sized; for an unbounded score
    * domain the documented swap is the same fixed-width binning as
    * [[statsKsBinned]] (identical query shape).
    */
  def statsAuc(spark: SparkSession, dir: String): DataFrame =
    aucOn(TextAnalysis.qualityModelServed(spark, dir)
      .select(col("label"), col("score_micro")))

  /** The exact-AUC computation over any (label ∈ {0,1}, score_micro)
    * frame, factored so specs can plant known-AUC score sets (tie
    * handling included).
    */
  private[graft] def aucOn(scored: DataFrame): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val grid = scored.groupBy($"score_micro")
      .agg(sum(when($"label" === 1, 1L).otherwise(0L)).as("p"),
        sum(when($"label" === 0, 1L).otherwise(0L)).as("n"))
    val w = Window.orderBy($"score_micro")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = grid.select($"p", $"n",
      coalesce(sum($"n").over(w), lit(0L)).as("n_below"))
    val tot = grid.agg(sum($"p").as("np"), sum($"n").as("nn"))
    cum.crossJoin(broadcast(tot))
      .filter($"np" > 0 && $"nn" > 0)
      .groupBy($"np", $"nn")
      .agg(sum($"p" * $"n_below" * 2 + $"p" * $"n").as("auc_num"))
      .select($"np", $"nn", $"auc_num",
        ($"auc_num".cast("double") /
          (($"np" * $"nn" * 2).cast("double"))).as("auc"))
  }

  val statsAucSql: String = TextAnalysis.qmTrainCtesSql +
    TextAnalysis.qmScoredCteSql + s""",
    grid AS (
      SELECT score_micro,
             CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
             CAST(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n
      FROM scored GROUP BY 1),
    cum AS (
      SELECT p, n,
             COALESCE(SUM(n) OVER (ORDER BY score_micro
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_below
      FROM grid),
    t AS (SELECT CAST(SUM(p) AS BIGINT) AS np, CAST(SUM(n) AS BIGINT) AS nn
          FROM grid)
    SELECT np, nn, CAST(SUM(p * n_below * 2 + p * n) AS BIGINT) AS auc_num,
           CAST(SUM(p * n_below * 2 + p * n) AS DOUBLE) /
           (2.0 * np * nn) AS auc
    FROM cum, t WHERE np > 0 AND nn > 0 GROUP BY np, nn"""

  /** Reliability table + expected calibration error of the trained
    * quality gate — the companion evaluation to [[statsAuc]]: AUC says
    * the model RANKS curated provenance above the rest; calibration
    * says whether the score is honest as a PROBABILITY (the number a
    * downstream sampler would weight by, or a thresholded gate would
    * tune against). The squared-loss model's natural probability
    * estimate is the margin clamped to [0, 1] (micro-units clamped to
    * [0, QmScale]); documents bin by that estimate into `bins`
    * fixed-width buckets and each bucket compares mean predicted
    * probability against observed positive rate.
    *
    * Everything before the final divisions is exact integer arithmetic:
    * per-bin n / positives / Σ clamped-micro are BIGINT sums
    * (associative — map-side-combined, order-independent), the ECE
    * numerator is Σ_b |Σ clamped_b − pos_b·S| (an exact BIGINT, since
    * mean_pred_b − pos_rate_b = (Σ clamped_b − pos_b·S)/(n_b·S) and the
    * n_b/N weights cancel one denominator), and each double column is
    * ONE division of exact integers — engine-exact hash, the
    * [[statsKs]]/[[statsAuc]] device.
    *
    * Shape: one map-side-combined groupBy on a ≤`bins`-row grid, then
    * the 1-row total broadcast back — two corpus-free shuffles over a
    * grid never larger than `bins`. Scales to any corpus.
    */
  def statsCalibration(spark: SparkSession, dir: String): DataFrame =
    calibrationOn(TextAnalysis.qualityModelServed(spark, dir)
      .select(col("label"), col("score_micro")))

  /** The calibration computation over any (label ∈ {0,1}, score_micro)
    * frame, factored so specs can plant known-calibration score sets
    * (clamping included).
    */
  private[graft] def calibrationOn(scored: DataFrame, bins: Int = 10): DataFrame =
    calibrationFinish(calibrationGrid(scored, bins))

  /** The reliability GRID of [[calibrationOn]]: clamp → fixed-width bin
    * → per-bin exact integer sums. A plain groupBy aggregation, so the
    * SAME code runs batch and as a complete-mode streaming aggregation
    * with ≤`bins` state rows (`q_stream_calibration`).
    */
  private[graft] def calibrationGrid(scored: DataFrame, bins: Int = 10): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val s = TextAnalysis.QmScale
    val clamped = least(greatest($"score_micro", lit(0L)), lit(s))
    scored
      .select($"label", clamped.as("c"))
      // `div` is exact BIGINT division (≡ DuckDB `//`); the last bin
      // absorbs the c = QmScale endpoint
      .withColumn("bin", least(expr(s"c * $bins div $s"), lit(bins - 1L)))
      .groupBy($"bin")
      .agg(count(lit(1L)).as("n"), sum($"label").as("pos"), sum($"c").as("pred_num"))
  }

  /** The derived columns of [[calibrationOn]] over a materialized grid:
    * the 1-row total (ECE numerator stays BIGINT) broadcast back, one
    * exact-integer division per double column.
    */
  private[graft] def calibrationFinish(grid: DataFrame): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val s = TextAnalysis.QmScale
    val tot = grid.agg(sum($"n").as("n_tot"),
      sum(abs($"pred_num" - $"pos" * s)).as("ece_num"))
    grid.crossJoin(broadcast(tot))
      .select($"bin", $"n", $"pos", $"pred_num",
        ($"pos".cast("double") / $"n".cast("double")).as("pos_rate"),
        ($"pred_num".cast("double") / ($"n" * s).cast("double")).as("mean_pred"),
        $"ece_num",
        ($"ece_num".cast("double") / ($"n_tot" * s).cast("double")).as("ece"))
  }

  /** Full train+evaluate replay of [[statsCalibration]]: the shared
    * 12-iteration training prefix ([[TextAnalysis.qmTrainCtesSql]]),
    * then the clamp → fixed-width bin → integer reliability grid →
    * one-row ECE total — every pre-division value BIGINT, every double
    * a single division of exact integers.
    */
  val statsCalibrationSql: String = {
    val s = TextAnalysis.QmScale
    val iters = TextAnalysis.QmIters
    TextAnalysis.qmTrainCtesSql + TextAnalysis.qmScoredCteSql + s""",
    cl AS (
      SELECT label,
             least(greatest(score_micro, 0), $s) AS c
      FROM scored),
    grid AS (
      SELECT least(c * 10 // $s, 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS pos,
             CAST(SUM(c) AS BIGINT) AS pred_num
      FROM cl GROUP BY 1),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
             CAST(SUM(abs(pred_num - pos * $s)) AS BIGINT) AS ece_num
      FROM grid)
    SELECT bin, n, pos, pred_num,
           CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
           CAST(pred_num AS DOUBLE) / CAST(n * $s AS DOUBLE) AS mean_pred,
           ece_num,
           CAST(ece_num AS DOUBLE) / CAST(n_tot * $s AS DOUBLE) AS ece
    FROM grid, t"""
  }

  /** Confusion matrix + threshold metrics of the trained quality gate —
    * the third evaluation axis next to [[statsAuc]] (ranking) and
    * [[statsCalibration]] (probability honesty): what the gate DOES at
    * its operating threshold. One conditional aggregation produces the
    * four exact BIGINT cells (tp/fp/tn/fn at pred = score ≥ S/2, the
    * serving threshold), and precision / recall / F1 / accuracy are
    * each ONE division of exact integers (F1 via its integer-numerator
    * form 2·tp / (2·tp + fp + fn) — no chained float ops) — engine-
    * exact hash. ONE map-side-combined corpus pass to a 1-row result;
    * degenerate corpora (a denominator of zero) emit no row rather
    * than NaN (the `stats_ks` guard).
    */
  def statsConfusion(spark: SparkSession, dir: String): DataFrame =
    confusionOn(TextAnalysis.qualityModelServed(spark, dir)
      .select(col("label"), col("pred")))

  /** The confusion computation over any (label ∈ {0,1}, pred ∈ {0,1})
    * frame, factored for planted-corpus specs.
    */
  private[graft] def confusionOn(scored: DataFrame): DataFrame =
    confusionFinish(confusionCells(scored))

  /** The four-cell aggregation of [[confusionOn]] — a plain global
    * conditional agg, so the SAME code runs batch and as a ONE-state-row
    * complete-mode streaming aggregation (`q_stream_confusion`).
    */
  private[graft] def confusionCells(scored: DataFrame): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.agg(
      sum(when($"label" === 1 && $"pred" === 1, 1L).otherwise(0L)).as("tp"),
      sum(when($"label" === 0 && $"pred" === 1, 1L).otherwise(0L)).as("fp"),
      sum(when($"label" === 0 && $"pred" === 0, 1L).otherwise(0L)).as("tn"),
      sum(when($"label" === 1 && $"pred" === 0, 1L).otherwise(0L)).as("fn"))
  }

  /** The ratio columns of [[confusionOn]] over materialized cells. */
  private[graft] def confusionFinish(cells: DataFrame): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    cells
      .filter($"tp" + $"fp" > 0 && $"tp" + $"fn" > 0)
      .select($"tp", $"fp", $"tn", $"fn",
        ($"tp".cast("double") / ($"tp" + $"fp").cast("double")).as("precision"),
        ($"tp".cast("double") / ($"tp" + $"fn").cast("double")).as("recall"),
        (($"tp" * 2).cast("double") /
          ($"tp" * 2 + $"fp" + $"fn").cast("double")).as("f1"),
        (($"tp" + $"tn").cast("double") /
          ($"tp" + $"fp" + $"tn" + $"fn").cast("double")).as("accuracy"))
  }

  /** Precision–recall CURVE of the trained gate — the tuning artifact
    * behind [[statsConfusion]]'s single operating point: one row per
    * DISTINCT score s with the metrics of the gate "admit iff
    * score ≥ s". tp/fp at each threshold are reverse-cumulative BIGINT
    * sums over the score grid (the [[statsAuc]] device with the window
    * flipped: grid groupBy + ONE ordered window over grid-sized rows),
    * precision/recall each one exact-integer division — engine-exact
    * hash. The grid is distinct-score-sized (never corpus-sized); the
    * unbounded-domain swap is [[statsKsBinned]]'s fixed-width binning,
    * same shape.
    */
  def statsPrCurve(spark: SparkSession, dir: String): DataFrame =
    prCurveOn(TextAnalysis.qualityModelServed(spark, dir)
      .select(col("label"), col("score_micro")))

  /** The PR-curve computation over any (label ∈ {0,1}, score_micro)
    * frame, factored for planted-corpus specs.
    */
  private[graft] def prCurveOn(scored: DataFrame): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val grid = scored.groupBy($"score_micro")
      .agg(sum(when($"label" === 1, 1L).otherwise(0L)).as("p"),
        sum(when($"label" === 0, 1L).otherwise(0L)).as("n"))
    val w = Window.orderBy($"score_micro".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = grid.agg(sum($"p").as("np"), sum($"n").as("nn"))
    grid.select($"score_micro",
        sum($"p").over(w).as("tp"), sum($"n").over(w).as("fp"))
      .crossJoin(broadcast(tot))
      .filter($"np" > 0)
      .select($"score_micro", $"tp", $"fp", $"np", $"nn",
        ($"tp".cast("double") / ($"tp" + $"fp").cast("double")).as("precision"),
        ($"tp".cast("double") / $"np".cast("double")).as("recall"))
  }

  /** Full train+evaluate replay of [[statsPrCurve]]: shared training,
    * the score grid, the reverse-cumulative threshold sums.
    */
  val statsPrCurveSql: String = {
    val iters = TextAnalysis.QmIters
    TextAnalysis.qmTrainCtesSql + TextAnalysis.qmScoredCteSql + s""",
    grid AS (
      SELECT score_micro,
             CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
             CAST(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n
      FROM scored GROUP BY 1),
    t AS (SELECT CAST(SUM(p) AS BIGINT) AS np, CAST(SUM(n) AS BIGINT) AS nn
          FROM grid),
    cum AS (
      SELECT score_micro,
             CAST(SUM(p) OVER (ORDER BY score_micro DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
             CAST(SUM(n) OVER (ORDER BY score_micro DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
      FROM grid)
    SELECT score_micro, tp, fp, np, nn,
           CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
           CAST(tp AS DOUBLE) / CAST(np AS DOUBLE) AS recall
    FROM cum, t WHERE np > 0"""
  }

  /** Full train+evaluate replay of [[statsConfusion]]: the shared
    * training prefix, the served prediction, then the four-cell
    * conditional aggregation and its integer-ratio metrics.
    */
  val statsConfusionSql: String = {
    val s = TextAnalysis.QmScale
    val iters = TextAnalysis.QmIters
    TextAnalysis.qmTrainCtesSql + s""",
    scored AS (
      SELECT f.y AS label,
             CASE WHEN ${TextAnalysis.qmMarginSql}
                  >= ${s / 2} THEN 1 ELSE 0 END AS pred
      FROM feat f, w$iters w),
    cells AS (
      SELECT
        CAST(SUM(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        CAST(SUM(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM scored)
    SELECT tp, fp, tn, fn,
           CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
           CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall,
           CAST(tp * 2 AS DOUBLE) / CAST(tp * 2 + fp + fn AS DOUBLE) AS f1,
           CAST(tp + tn AS DOUBLE) / CAST(tp + fp + tn + fn AS DOUBLE) AS accuracy
    FROM cells WHERE tp + fp > 0 AND tp + fn > 0"""
  }

  /** Pearson χ² contingency diagnostic for lang × source independence —
    * the "is my language mix confounded with my source mix?" check a
    * curation pipeline runs before trusting per-source sampling weights
    * (a lang/source dependence means source-level up/down-sampling
    * silently reshapes the language distribution). Emits the FULL
    * contingency diagnostic, one row per (lang, source) cell INCLUDING
    * structurally-absent cells (observed = 0 contributes (0−e)²/e like
    * any other cell): observed count, row/col/grand totals, the exact
    * integer residual diff = o·N − n_lang·n_source (diff/N is o−e), and
    * the cell's χ² contribution (o−e)²/e = diff²/(N·n_lang·n_source) as
    * ONE fixed double expression over exact integers — the [[statsCorr]]
    * device; Σ contrib over the ≤|L|·|S| cells is the χ² statistic with
    * (|L|−1)(|S|−1) dof (ProfileSpec pins it against a hand-computed
    * table; the hash-compared surface stays per-cell so no float SUM's
    * association order is ever compared).
    *
    * Sub-2^53 contract (same as [[statsCorr]]): |diff| ≤ N·max(o, n_l)
    * ≤ N² stays double-exact while N² < 2^53, i.e. to ~9·10^7 docs
    * (the [[statsMi]] bound, tightened per the r19 ADVICE); past that,
    * decimal moments.
    *
    * Scale: ONE map-side-combined corpus pass onto the ≤|L|·|S| cell
    * grid, which is COLLECTED (bounded by the key domain, never the
    * corpus — the embed_pca / k-means-codebook device) so marginals,
    * totals, and the zero-cell completion are grid-side driver math;
    * nothing after the single shuffle touches corpus rows, and the
    * static plan has exactly one corpus scan (PlanShapeSpec pins it).
    *
    * EAGER contract (r18 ADVICE): because the grid is collected at
    * DataFrame-CONSTRUCTION time, this is the one queries-map entry
    * that executes its corpus pass before the caller ever acts on the
    * returned frame — a plan-dump/explain consumer pays the
    * aggregation. Accepted and documented (the grid device needs the
    * values to build the zero-completed frame); [[statsMi]] shares the
    * contract. Null lang/source is REJECTED loudly rather than
    * half-flowing: the DuckDB oracle's equi-join would drop a NULL
    * cell's observed count while keeping it in the marginals — an
    * inconsistent grid — so a null key is a fixture/contract error,
    * not a value.
    */
  def statsChi2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ONE corpus pass; the collected grid is bounded by the KEY DOMAIN
    // (|L|·|S|), never the corpus — the embed_pca/codebook device. A
    // DataFrame formulation would branch the cells subtree four ways
    // (marginals, totals, zero-cell completion) and re-scan the corpus
    // per branch in the static plan; grid-side math has no such hazard.
    val cells = chi2Cells(spark, dir)
    val nLang = cells.groupBy(_._1).map { case (l, cs) => l -> cs.map(_._3).sum }
    val nSource = cells.groupBy(_._2).map { case (s, cs) => s -> cs.map(_._3).sum }
    val nTotal = cells.map(_._3).sum
    val o = cells.map { case (l, s, c) => (l, s) -> c }.toMap
    val rows = for {
      l <- nLang.keys.toSeq.sorted
      s <- nSource.keys.toSeq.sorted
    } yield {
      val oc = o.getOrElse((l, s), 0L)
      val diff = oc * nTotal - nLang(l) * nSource(s)
      val contrib = (diff.toDouble * diff.toDouble) /
        (nTotal.toDouble * nLang(l).toDouble * nSource(s).toDouble)
      (l, s, oc, nLang(l), nSource(s), nTotal, diff, contrib)
    }
    rows.toDF("lang", "source", "o", "n_lang", "n_source", "n_total",
      "diff", "contrib")
  }

  /** The shared collected lang×source cell grid behind [[statsChi2]] /
    * [[statsMi]] — one map-side-combined corpus pass, null keys
    * rejected (see the statsChi2 scaladoc for why null must not
    * half-flow through the grid device).
    */
  private def chi2Cells(spark: SparkSession,
      dir: String): Array[(String, String, Long)] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
      .collect().map { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1),
          s"null lang/source cell in documents ($dir): the grid " +
            "contract requires non-null keys (a null would join " +
            "inconsistently in the SQL oracle)")
        (r.getString(0), r.getString(1), r.getLong(2))
      }
  }

  val statsChi2Sql: String = """
    WITH cells AS (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
    r AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS n_lang FROM cells GROUP BY 1),
    c AS (SELECT source, CAST(SUM(o) AS BIGINT) AS n_source FROM cells GROUP BY 1),
    t AS (SELECT CAST(SUM(o) AS BIGINT) AS n_total FROM cells),
    full_grid AS (
      SELECT r.lang, c.source, COALESCE(cells.o, 0) AS o,
             r.n_lang, c.n_source, t.n_total
      FROM r CROSS JOIN c CROSS JOIN t
      LEFT JOIN cells ON cells.lang = r.lang AND cells.source = c.source)
    SELECT lang, source, o, n_lang, n_source, n_total,
           o * n_total - n_lang * n_source AS diff,
           (CAST(o * n_total - n_lang * n_source AS DOUBLE) *
            CAST(o * n_total - n_lang * n_source AS DOUBLE)) /
           (CAST(n_total AS DOUBLE) * CAST(n_lang AS DOUBLE) *
            CAST(n_source AS DOUBLE)) AS contrib
    FROM full_grid"""

  /** Per-language Gini impurity of the SOURCE mix — the diversity score
    * a mixture-balancing pass reads per stratum (gini → 0 means one
    * source dominates the language; → 1−1/|S| means a uniform mix): the
    * probability two random docs of the language come from DIFFERENT
    * sources, 1 − Σ_s (c_s/n)². Exact integer moments (n, Σ c_s², and
    * the dominant source count) with gini as one fixed double expression
    * — order-independent BIGINTs, so the float column hash-matches.
    *
    * Scale: the same one-pass grid shape as [[statsChi2]] — corpus →
    * ≤|L|·|S| cells map-side-combined, then per-lang folds over the
    * grid only.
    */
  def statsGini(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.documents(spark, dir)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
    cells.groupBy($"lang").agg(
      sum($"o").as("n_docs"),
      count(lit(1)).as("n_sources"),
      max($"o").as("top_source_docs"),
      sum($"o" * $"o").as("sum_sq"))
      .select($"lang", $"n_docs", $"n_sources", $"top_source_docs", $"sum_sq",
        (lit(1.0) - $"sum_sq".cast("double") /
          ($"n_docs".cast("double") * $"n_docs".cast("double"))).as("gini"))
  }

  val statsGiniSql: String = """
    WITH cells AS (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2)
    SELECT lang,
           CAST(SUM(o) AS BIGINT) AS n_docs,
           COUNT(*) AS n_sources,
           CAST(MAX(o) AS BIGINT) AS top_source_docs,
           CAST(SUM(o * o) AS BIGINT) AS sum_sq,
           1.0 - CAST(CAST(SUM(o * o) AS BIGINT) AS DOUBLE) /
                 (CAST(CAST(SUM(o) AS BIGINT) AS DOUBLE) *
                  CAST(CAST(SUM(o) AS BIGINT) AS DOUBLE)) AS gini
    FROM cells GROUP BY lang"""

  /** Pointwise-mutual-information grid for lang × source — the signed
    * association readout the [[statsChi2]] magnitude test doesn't give
    * (χ² says "dependent", PMI says WHICH cells are over/under-
    * represented and by how much): per cell the joint probability
    * p_cell = o/N and the LIFT o·N/(n_lang·n_source) = e^PMI (the
    * [[TextAnalysis.cooccur]] device — lift > 1 means the language is
    * over-represented in the source, < 1 under-represented, and the
    * ln that would turn it into PMI-in-nats stays OUT of the
    * hash-compared contract because the JVM's Math.log and libm
    * diverge in the last ulp, measured at text_cooccur). The corpus
    * mutual information I(L;S) = Σ p_cell·ln(lift) over the o>0 cells
    * is a ProfileSpec-pinned SCALAR, not a hashed column. Zero cells
    * emit p_cell = 0, lift = 0 (their MI contribution is 0 by the
    * 0·ln 0 convention) so the grid completion matches statsChi2
    * row-for-row.
    *
    * Sub-2^53 contract: o·N and n_lang·n_source are Long products cast
    * once to double — exact while o·N < 2^53 ≈ 9.0·10^15, i.e. to
    * ~9·10^7 docs in the worst case (a cell holding the whole corpus
    * makes o·N = N²; r19 ADVICE tightened the former ~10^8 claim) —
    * then the two divisions are IEEE correctly rounded, hence
    * bit-stable across engines. Past that bound, decimal moments.
    *
    * Scale + EAGER contract: identical to [[statsChi2]] — one
    * map-side-combined corpus pass onto the collected ≤|L|·|S| grid at
    * construction time; everything after is driver-side grid math.
    */
  def statsMi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = chi2Cells(spark, dir)
    val nLang = cells.groupBy(_._1).map { case (l, cs) => l -> cs.map(_._3).sum }
    val nSource = cells.groupBy(_._2).map { case (s, cs) => s -> cs.map(_._3).sum }
    val nTotal = cells.map(_._3).sum
    val o = cells.map { case (l, s, c) => (l, s) -> c }.toMap
    val rows = for {
      l <- nLang.keys.toSeq.sorted
      s <- nSource.keys.toSeq.sorted
    } yield {
      val oc = o.getOrElse((l, s), 0L)
      val pCell = oc.toDouble / nTotal.toDouble
      val lift = (oc * nTotal).toDouble /
        (nLang(l) * nSource(s)).toDouble
      (l, s, oc, nLang(l), nSource(s), nTotal, pCell, lift)
    }
    rows.toDF("lang", "source", "o", "n_lang", "n_source", "n_total",
      "p_cell", "lift")
  }

  val statsMiSql: String = """
    WITH cells AS (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
    r AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS n_lang FROM cells GROUP BY 1),
    c AS (SELECT source, CAST(SUM(o) AS BIGINT) AS n_source FROM cells GROUP BY 1),
    t AS (SELECT CAST(SUM(o) AS BIGINT) AS n_total FROM cells),
    full_grid AS (
      SELECT r.lang, c.source, COALESCE(cells.o, 0) AS o,
             r.n_lang, c.n_source, t.n_total
      FROM r CROSS JOIN c CROSS JOIN t
      LEFT JOIN cells ON cells.lang = r.lang AND cells.source = c.source)
    SELECT lang, source, o, n_lang, n_source, n_total,
           CAST(o AS DOUBLE) / CAST(n_total AS DOUBLE) AS p_cell,
           CAST(o * n_total AS DOUBLE) /
             CAST(n_lang * n_source AS DOUBLE) AS lift
    FROM full_grid"""
}
