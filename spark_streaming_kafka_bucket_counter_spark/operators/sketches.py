"""Distinct-count sketching: KMV (k-minimum-values) estimator built from
engine-portable md5 hashes — the deterministic cousin of HyperLogLog.

Why KMV here: BUILT-IN HLL implementations differ across engines
(register layouts, bias tables), so ``approx_count_distinct`` can never
hash-match a DuckDB oracle. (Round 9 adds the real HyperLogLog anyway —
built from the same portable hash on both sides with the register state
itself under the hash gate; see :func:`hll_registers`.) KMV has a
closed-form estimator driven ONLY by the hash
function: hash every value uniformly into [0, 2^32), keep the k smallest
distinct hashes; if fewer than k distinct values exist the answer is
exact, else estimate (k-1) / (h_k / 2^32) where h_k is the k-th smallest
hash. Same md5-derived hash on both engines -> identical estimates,
bit for bit.

Scale design: distinct (group, hash) pairs first (partial-agg shuffle),
then ONE window pass ranks hashes within each group and keeps rank <= k
— the surviving set is k rows per group, so the final aggregation is
tiny. No per-group collect_set materialization (which would buffer whole
groups in memory at 100 TB); the window's sort is bounded by the same
shuffle the distinct already paid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_hash32, token_hash32_sql

HASH_SPACE = float(1 << 32)


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group distinct-count estimate via KMV over md5 hashes.

    Output: group cols + ``n_kept`` (distinct hashes kept, <= k),
    ``estimate`` (double, 6 dp) — exact when the group has < k distinct
    values, else the KMV estimator.
    """
    hashed = df.select(
        *group_cols, token_hash32(F.col(value_col).cast("string")).alias("_h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kept = hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise(F.lit(float(k - 1)) / (F.max("_h") / F.lit(HASH_SPACE))),
            6,
        ).alias("estimate"),
    )


def histogram_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group approximate quantiles via a fixed-bin histogram — the
    scale path for percentiles: exact ``percentile`` buffers every value
    of a group in memory, while the histogram is a (group, bin) count
    with map-side combine, one cumulative window over ``bins`` rows per
    group, and a closed-form answer (upper edge of the first bin whose
    cumulative count reaches ceil(q*N); error <= one bin width).

    The [lo, hi) domain is DECLARED, not data-derived — that keeps the
    sketch one-pass, mergeable, and deterministic (both engines bin with
    the same floor/clamp arithmetic). Out-of-domain values clamp to the
    edge bins.
    """
    w = (hi - lo) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - lo) / F.lit(w)).cast("int")),
    )
    counts = df.groupBy(*group_cols, b.alias("_bin")).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    win = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*group_cols)
    cum = counts.withColumn("_cum", F.sum("_cnt").over(win)).withColumn(
        "_n", F.sum("_cnt").over(tot)
    )
    upper = F.lit(lo) + (F.col("_bin") + 1) * F.lit(w)
    aggs = [F.max("_n").cast("long").alias("n")]
    for q in qs:
        name = f"p{str(q).replace('0.', '')}"
        aggs.append(
            F.round(
                F.min(F.when(F.col("_cum") >= F.ceil(F.lit(q) * F.col("_n")), upper)),
                6,
            ).alias(name)
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def histogram_quantiles_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> str:
    """DuckDB oracle twin (same binning, same ceil-rank rule)."""
    groups = ", ".join(group_cols)
    w = (hi - lo) / bins
    b = (
        f"LEAST({bins - 1}, GREATEST(0, "
        f"CAST(FLOOR(({value_col} - {lo}) / {w}) AS INTEGER)))"
    )
    # CAST to DOUBLE — twice, deliberately. DuckDB parses numeric
    # literals (bin width ``0.5``, edge ``lo``) as DECIMAL and does the
    # quantile-edge arithmetic ``lo + (bin+1)*w`` EXACTLY, while Spark
    # computes the same edge in binary double; a value landing on a
    # .xxxxxx5 boundary would then ROUND differently at 6dp. Casting
    # the width operand to DOUBLE makes DuckDB do the arithmetic in
    # double, matching Spark bit-for-bit; the outer cast keeps the
    # column type out of DECIMAL (the oracle type audit bans DECIMAL
    # outright — driver-lossy through pandas).
    q_cols = ", ".join(
        f"CAST(ROUND(MIN(CASE WHEN cum >= CEIL({q} * n) "
        f"THEN {lo} + (bin + 1) * CAST({w} AS DOUBLE) END), 6) AS DOUBLE)"
        f" AS p{str(q).replace('0.', '')}"
        for q in qs
    )
    return f"""
    WITH binned AS (
      SELECT {groups}, {b} AS bin, COUNT(*) AS cnt
      FROM {table} GROUP BY {groups}, bin
    ),
    cumed AS (
      SELECT {groups}, bin, cnt,
             SUM(cnt) OVER (PARTITION BY {groups} ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY {groups}) AS n
      FROM binned
    )
    SELECT {groups}, CAST(MAX(n) AS BIGINT) AS n, {q_cols}
    FROM cumed GROUP BY {groups}
    """


def kmv_distinct_sql(
    table: str, group_cols: list[str], value_col: str, k: int = 64
) -> str:
    """DuckDB oracle twin of :func:`kmv_distinct` (same hash, same
    estimator, same rounding)."""
    groups = ", ".join(group_cols)
    h = token_hash32_sql(f"CAST({value_col} AS VARCHAR)")
    return f"""
    WITH hashed AS (
      SELECT DISTINCT {groups}, {h} AS h FROM {table}
    ),
    kept AS (
      SELECT {groups}, h,
             row_number() OVER (PARTITION BY {groups} ORDER BY h) AS rn
      FROM hashed
    )
    SELECT {groups},
           COUNT(*) AS n_kept,
           ROUND(CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                      ELSE {float(k - 1)} / (MAX(h) / {HASH_SPACE}) END, 6) AS estimate
    FROM kept WHERE rn <= {k}
    GROUP BY {groups}
    """


# ---------------------------------------------------------------------------
# Count-min sketch (frequency estimation / heavy hitters)
# ---------------------------------------------------------------------------


def _cm_col(key: "F.Column", row: int, width: int) -> "F.Column":
    """Row-r column index: the r-th 8-hex-char slice of ONE md5 gives
    depth (<= 4) independent 32-bit hashes per key — one md5 total."""
    return (
        F.conv(F.substring(F.md5(key), 8 * row + 1, 8), 16, 10).cast("long")
        % F.lit(width)
    )


def cm_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a count-min sketch over a key stream: the FIXED-SPACE
    frequency summary (depth x width counters, here rows of
    (row, col, cnt)) whose estimate MIN_r(cnt[r][h_r(key)]) never
    under-counts — overestimates bounded by 2N/width with prob
    1 - 2^-depth.

    Shape: one explode(depth) + one (row, col) groupBy with map-side
    combine — the shuffle carries at most depth*width rows no matter the
    corpus size, and sketches MERGE by summing counters, so per-shard
    sketches fold into a corpus sketch without touching raw keys again.
    ``depth <= 4`` (md5 has 32 hex chars = 4 independent 8-char slices).
    """
    if not 1 <= depth <= 4:
        raise ValueError(f"depth must be in [1, 4] (one md5 slice per row): {depth}")
    pos = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cm_col(F.col(key_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p")
    )
    return (
        pos.select(F.col("p.row").alias("row"), F.col("p.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query the sketch for each probe key: join the probe's depth
    (row, col) positions against the counter table, take the MIN.

    The probe side is the small one (a candidate/watch list) — it is
    exploded to depth rows and broadcast against the bounded
    depth*width-row sketch; cost is independent of the stream length the
    sketch summarized. Keys the sketch never saw still hit real counters
    (collisions), which is exactly CM semantics: estimates are upper
    bounds, never proofs of absence.
    """
    ppos = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cm_col(F.col(key_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, F.col("p.row").alias("row"), F.col("p.col").alias("col"))
    return (
        ppos.join(sketch, ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_count"))
    )


def cm_sketch_sql(src: str, key_expr: str, depth: int = 4, width: int = 1024) -> str:
    """DuckDB twin of :func:`cm_sketch` as a CTE body (yields ``cm`` with
    (row, col, cnt)) — same md5 slices, same modulus, identical counters
    (collisions and all)."""
    rows = " UNION ALL ".join(
        f"SELECT {r} AS rw, CAST('0x' || substr(md5(k), {8 * r + 1}, 8) AS BIGINT)"
        f" % {width} AS col FROM keyed"
        for r in range(depth)
    )
    return f"""
    keyed AS (SELECT {key_expr} AS k FROM {src}),
    cmpos AS ({rows}),
    cm AS (SELECT rw, col, COUNT(*) AS cnt FROM cmpos GROUP BY 1, 2)
    """


# ---------------------------------------------------------------------------
# Histogram-quantile winsorization (outlier clipping for feature pipelines)
# ---------------------------------------------------------------------------


def _qname(q: float) -> str:
    return f"p{str(q).replace('0.', '')}"


def winsorize_by_histogram(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Clip a value column to its per-group [q_lo, q_hi] band — the
    outlier-robust normalization step before a value becomes a model
    feature — with the cutoffs read from the FIXED-BIN histogram sketch
    (:func:`histogram_quantiles`), not an exact percentile: one
    (group, bin) aggregation with map-side combine instead of buffering
    whole groups, and the cutoff table is groups-sized (broadcast back
    onto the rows — the fact side never shuffles).

    Values and cutoffs are compared in exact 1e-4 fixed point, so the
    clamp is bit-identical across engines. Output carries ``value_e4``
    and ``winsorized_e4`` (both BIGINT).
    """
    cuts = histogram_quantiles(
        df, group_cols, value_col, lo, hi, bins, qs=(q_lo, q_hi)
    ).select(
        *group_cols,
        F.round(F.col(_qname(q_lo)) * 10000).cast("long").alias("_lo_e4"),
        F.round(F.col(_qname(q_hi)) * 10000).cast("long").alias("_hi_e4"),
    )
    v_e4 = F.round(F.col(value_col) * 10000).cast("long")
    rows = df.select(
        *(extra_cols or []), *group_cols, v_e4.alias("value_e4")
    )
    # LEFT join + passthrough: rows whose group key is NULL (or whose
    # group has no cuts row) keep their raw value instead of silently
    # vanishing — an inner equi-join never matches NULL keys, which
    # would drop rows from a transform documented as clipping values
    clamped = F.least(
        F.greatest(F.col("value_e4"), F.col("_lo_e4")), F.col("_hi_e4")
    )
    return rows.join(F.broadcast(cuts), group_cols, "left").select(
        *(extra_cols or []),
        *group_cols,
        "value_e4",
        F.coalesce(clamped, F.col("value_e4")).alias("winsorized_e4"),
    )


def winsorize_by_histogram_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    extra_cols: list[str] | None = None,
) -> str:
    """DuckDB twin: same sketch cutoffs, same fixed-point clamp."""
    groups = ", ".join(group_cols)
    extras = "".join(f"e.{c}, " for c in (extra_cols or []))
    ve4 = f"CAST(ROUND(e.{value_col} * 10000) AS BIGINT)"
    lo_e4 = f"CAST(ROUND(c.{_qname(q_lo)} * 10000) AS BIGINT)"
    hi_e4 = f"CAST(ROUND(c.{_qname(q_hi)} * 10000) AS BIGINT)"
    inner = histogram_quantiles_sql(
        table, group_cols, value_col, lo, hi, bins, qs=(q_lo, q_hi)
    )
    return f"""
    WITH cuts AS ({inner})
    SELECT {extras}{groups},
           {ve4} AS value_e4,
           COALESCE(LEAST(GREATEST({ve4}, {lo_e4}), {hi_e4}), {ve4}) AS winsorized_e4
    FROM {table} e LEFT JOIN cuts c USING ({groups})
    """


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap (confidence intervals without rand())
# ---------------------------------------------------------------------------

#: hash(id, replicate) % 100 -> approximate Poisson(1) weights
#: P(0)=.37, P(1)=.37, P(2)=.18, P(3)=.08 (textbook online-bootstrap recipe,
#: discretized so both engines derive IDENTICAL weights from md5)
_BOOT_T0, _BOOT_T1, _BOOT_T2 = 37, 74, 92


def _boot_weight(id_col: str, b) -> "F.Column":
    h = token_hash32(F.concat_ws(":", F.col(id_col).cast("string"), b.cast("string")))
    hm = h % F.lit(100)
    return (
        F.when(hm < _BOOT_T0, F.lit(0))
        .when(hm < _BOOT_T1, F.lit(1))
        .when(hm < _BOOT_T2, F.lit(2))
        .otherwise(F.lit(3))
        .cast("long")
    )


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_e4: "F.Column",
    replicates: int = 16,
) -> DataFrame:
    """Per-group mean with a bootstrap confidence band — at scale,
    WITHOUT ``rand()``: replicate weights are deterministic
    hash-derived approximate-Poisson(1) draws (the classic streaming/
    online bootstrap), so the result is reproducible, partition-layout-
    independent, and oracle-replayable.

    ``value_e4`` must already be exact integer units (e.g. value*1e4).
    Output: (group, n, mean_e4, lo_e4, hi_e4) where lo/hi are the
    ~12.5th/~93.75th percentile of the replicate means (order stats of
    ``replicates`` sorted means — exact, no interpolation).

    Scale shape: the replicate explode multiplies map output by B
    BEFORE one (group, b) partial-agg shuffle (combiner collapses to
    #groups x B rows), then a #groups-sized rollup. No second data
    scan, no driver work; B is the explicit cost knob.
    """
    from ..sources.files import fan_out_scan

    # the B-way replicate explode + per-row md5 weight is scan-stage
    # work — fan the narrow projection out first (r12; no-op at scale)
    b = F.explode(F.array(*[F.lit(i) for i in range(replicates)])).alias("_b")
    exploded = fan_out_scan(
        df.select(F.col(group_col), F.col(id_col), value_e4.alias("_v")), id_col
    ).select(F.col(group_col), F.col(id_col), F.col("_v"), b).withColumn(
        "_w", _boot_weight(id_col, F.col("_b"))
    )
    rep = (
        exploded.groupBy(group_col, "_b")
        .agg(
            F.sum(F.col("_w") * F.col("_v")).alias("_sw"),
            F.sum("_w").alias("_nw"),
        )
        .filter(F.col("_nw") > 0)
        .select(group_col, F.expr("_sw div _nw").alias("_mean_b"))
    )
    reps = rep.groupBy(group_col).agg(
        F.array_sort(F.collect_list("_mean_b")).alias("_means")
    )
    base = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"), F.sum(value_e4).alias("_sv")
    )
    n_r = F.size("_means")
    lo_i = F.greatest(F.lit(1), F.expr("size(_means) div 8"))
    hi_i = F.least(n_r, F.expr("(15 * size(_means) + 15) div 16"))
    return (
        base.join(reps, group_col)
        .select(
            group_col,
            F.col("n").cast("long").alias("n"),
            F.expr("_sv div n").cast("long").alias("mean_e4"),
            F.element_at("_means", lo_i.cast("int")).cast("long").alias("lo_e4"),
            F.element_at("_means", hi_i.cast("int")).cast("long").alias("hi_e4"),
        )
    )


def bootstrap_mean_ci_sql(
    table: str,
    group_col: str,
    id_col: str,
    value_e4_sql: str,
    replicates: int = 16,
) -> str:
    """CTE chain ending in `boot_ci` mirroring :func:`bootstrap_mean_ci`."""
    h = token_hash32_sql(f"CAST({id_col} AS VARCHAR) || ':' || CAST(b AS VARCHAR)")
    return f"""boot_x AS (
      SELECT {group_col}, {id_col}, {value_e4_sql} AS _v, b,
             CASE WHEN {h} % 100 < {_BOOT_T0} THEN 0
                  WHEN {h} % 100 < {_BOOT_T1} THEN 1
                  WHEN {h} % 100 < {_BOOT_T2} THEN 2
                  ELSE 3 END AS _w
      FROM {table}, (SELECT unnest(range({replicates})) AS b)
    ),
    boot_rep AS (
      SELECT {group_col}, b,
             SUM(_w * _v) AS _sw, SUM(_w) AS _nw
      FROM boot_x GROUP BY 1, 2
    ),
    boot_means AS (
      SELECT {group_col}, list_sort(list(_sw // _nw)) AS _means
      FROM boot_rep WHERE _nw > 0 GROUP BY 1
    ),
    boot_base AS (
      SELECT {group_col}, COUNT(*) AS n, SUM({value_e4_sql}) AS _sv
      FROM {table} GROUP BY 1
    ),
    boot_ci AS (
      SELECT b.{group_col},
             CAST(b.n AS BIGINT) AS n,
             CAST(b._sv // b.n AS BIGINT) AS mean_e4,
             CAST(m._means[GREATEST(1, len(m._means) // 8)] AS BIGINT) AS lo_e4,
             CAST(m._means[LEAST(len(m._means), (15 * len(m._means) + 15) // 16)] AS BIGINT) AS hi_e4
      FROM boot_base b JOIN boot_means m USING ({group_col})
    )"""


# ---------------------------------------------------------------------------
# HyperLogLog (round 9)
# ---------------------------------------------------------------------------

#: HLL precision: 2^9 = 512 registers (~4.6% standard error)
HLL_P = 9


def _hll_consts(p: int):
    m = 1 << p
    rest = 32 - p  # value bits below the register index
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # the whole numerator folded into ONE Python float literal shared by
    # both engines: est = C / s_scaled is then a single IEEE division,
    # no libm, no cross-engine rounding surface
    c = alpha * float(m) * float(m) * float(1 << (rest + 1))
    return m, rest, c


def hll_registers(df: DataFrame, value_col: str, p: int = HLL_P) -> DataFrame:
    """The REAL HyperLogLog this module's KMV note said engines can't
    hash-match — made matchable (round 9) by building it from the same
    portable md5-derived hash on both sides and exposing the REGISTER
    STATE itself: register index = top ``p`` hash bits, rho = leading
    zeros of the remaining bits + 1 via ``length(bin(w))`` (binary
    string length — integer-exact on both engines, no log2/libm).

    Scale: one ``select`` of (bucket, rho) in JVM codegen, one
    ``groupBy(bucket).max`` with map-side partial aggregation — the
    shuffle is bounded by 2^p rows per mapper regardless of input size,
    and registers MERGE by element-wise max (shards, streams, days:
    union then re-max — pytest-pinned)."""
    m, rest, _ = _hll_consts(p)
    h = token_hash32(F.col(value_col).cast("string"))
    bucket = F.shiftright(h, rest)
    w = h % F.lit(1 << rest)
    rho = F.when(w == 0, F.lit(rest + 1)).otherwise(
        F.lit(rest + 1) - F.length(F.bin(w))
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("long").alias("max_rho"))
        .select(F.col("bucket").cast("long").alias("bucket"), "max_rho")
    )


def hll_registers_sql(table: str, value_col: str, p: int = HLL_P) -> str:
    """DuckDB oracle twin of :func:`hll_registers` — same hash, same
    bucket split, same bin-length rho."""
    m, rest, _ = _hll_consts(p)
    mask = (1 << rest) - 1
    h = token_hash32_sql(f"CAST({value_col} AS VARCHAR)")
    return f"""
    SELECT CAST(h >> {rest} AS BIGINT) AS bucket,
           CAST(MAX(CASE WHEN (h & {mask}) = 0 THEN {rest + 1}
                         ELSE {rest + 1} - length(bin(h & {mask}))
                    END) AS BIGINT) AS max_rho
    FROM (SELECT {h} AS h FROM {table})
    GROUP BY 1
    """


def hll_cardinality(df: DataFrame, value_col: str, p: int = HLL_P) -> DataFrame:
    """One-row HLL summary: register diagnostics as exact integers
    (``zero_buckets``, ``s_scaled`` = sum over all 2^p registers of
    2^(rest+1-M_j), scaled so empty registers contribute an exact
    integer) plus the raw HLL estimate ``est_floor`` =
    floor(alpha*m^2 / sum 2^-M) — a single IEEE division of a shared
    constant by an exact integer, deterministic across engines — and
    the exact distinct count beside it. Bias corrections (linear
    counting) intentionally stay OUT of the hashed columns (they need
    ln(), whose last ulp differs across libms); accuracy is pinned in
    pytest instead."""
    m, rest, c = _hll_consts(p)
    unit = 1 << (rest + 1)
    regs = hll_registers(df, value_col, p)
    s = regs.agg(
        F.count(F.lit(1)).alias("_nonzero"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(rest + 1) - F.col("max_rho")).cast("long")
        ).alias("_s_occ"),
    )
    exact = df.select(
        F.countDistinct(F.col(value_col)).cast("long").alias("n_exact")
    )
    s_scaled = F.col("_s_occ") + (F.lit(m) - F.col("_nonzero")) * F.lit(unit)
    return s.crossJoin(exact).select(
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("_nonzero")).cast("long").alias("zero_buckets"),
        s_scaled.cast("long").alias("s_scaled"),
        F.floor(F.lit(c) / s_scaled).cast("long").alias("est_floor"),
        "n_exact",
    )


def hll_cardinality_sql(table: str, value_col: str, p: int = HLL_P) -> str:
    """DuckDB oracle twin of :func:`hll_cardinality`."""
    m, rest, c = _hll_consts(p)
    unit = 1 << (rest + 1)
    regs = hll_registers_sql(table, value_col, p)
    return f"""
    WITH regs AS ({regs}),
    s AS (SELECT COUNT(*) AS nonzero,
                 CAST(SUM(CAST(POWER(2, {rest + 1} - max_rho) AS BIGINT))
                      AS BIGINT) AS s_occ
          FROM regs)
    SELECT CAST({m} AS BIGINT) AS m,
           CAST({m} - nonzero AS BIGINT) AS zero_buckets,
           CAST(s_occ + ({m} - nonzero) * {unit} AS BIGINT) AS s_scaled,
           CAST(FLOOR({c!r} / (s_occ + ({m} - nonzero) * {unit}))
                AS BIGINT) AS est_floor,
           (SELECT CAST(COUNT(DISTINCT {value_col}) AS BIGINT)
            FROM {table}) AS n_exact
    FROM s
    """


# ---------------------------------------------------------------------------
# Theta-style set-operation sketch (round 9)
# ---------------------------------------------------------------------------


def kmv_set_ops(
    df: DataFrame, cond_a, cond_b, value_col: str, k: int = 256
) -> DataFrame:
    """Distinct-set UNION / INTERSECTION / Jaccard estimates for two
    predicates over one table (theta-sketch style, Datasketches'
    published construction over this module's portable hash): each side
    keeps its k smallest distinct hashes; theta = min of the two
    k-th-smallest thresholds (or the full hash space when a side is
    exact); every kept hash below theta is a uniform sample of the
    side, so |A∩B| ~ |SA∩SB| / (theta/2^32) and likewise for the
    window union. Output carries the INTEGER sketch state
    (``theta_scaled``, ``inter_kept``, ``union_kept``) plus
    single-division estimates and the exact counts beside them.

    Scale: two distinct-hash aggregations + one rank window bounded at
    k rows per side — no join of the raw sides; sketches merge by
    keeping the k smallest of a union, so shards/streams compose."""
    space = float(1 << 32)
    h = token_hash32(F.col(value_col).cast("string"))
    # a row satisfying BOTH predicates must feed BOTH sketches — a
    # when().when() side label would drop dual-matching rows from side
    # b and bias the intersection low (r9 review catch)
    sides = (
        df.filter(cond_a).select(F.lit("a").alias("_side"), h.alias("_h"))
        .unionAll(
            df.filter(cond_b).select(F.lit("b").alias("_side"), h.alias("_h"))
        )
    )
    both = (
        df.filter(cond_a | cond_b)
        .select(
            F.when(cond_a, F.lit(1)).otherwise(F.lit(0)).alias("_ina"),
            F.when(cond_b, F.lit(1)).otherwise(F.lit(0)).alias("_inb"),
            F.col(value_col).cast("string").alias("_v"),
        )
        .groupBy("_v")
        .agg(F.max("_ina").alias("_ina"), F.max("_inb").alias("_inb"))
        .agg(
            F.sum(F.col("_ina") * F.col("_inb")).cast("long").alias("n_inter_exact"),
            F.count(F.lit(1)).cast("long").alias("n_union_exact"),
        )
    )
    dist = sides.distinct()
    w = Window.partitionBy("_side").orderBy("_h")
    kept = dist.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    theta = kept.groupBy("_side").agg(
        F.count(F.lit(1)).alias("_n"), F.max("_h").alias("_hk")
    ).agg(
        F.min(
            F.when(F.col("_n") >= k, F.col("_hk")).otherwise(F.lit(1 << 32))
        ).alias("theta_scaled")
    )
    win = kept.crossJoin(theta).filter(F.col("_h") < F.col("theta_scaled"))
    state = win.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_nsides")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("union_kept"),
        F.sum(F.when(F.col("_nsides") == 2, 1).otherwise(0))
        .cast("long")
        .alias("inter_kept"),
    )
    est_i = F.round(F.col("inter_kept") * F.lit(space) / F.col("theta_scaled"), 6)
    est_u = F.round(F.col("union_kept") * F.lit(space) / F.col("theta_scaled"), 6)
    jac = F.round(
        F.when(F.col("union_kept") > 0, F.col("inter_kept"))
        .otherwise(F.lit(0))
        .cast("double")
        / F.greatest(F.col("union_kept"), F.lit(1)),
        6,
    )
    return (
        state.crossJoin(theta)
        .crossJoin(both)
        .select(
            F.col("theta_scaled").cast("long").alias("theta_scaled"),
            "union_kept",
            "inter_kept",
            est_u.alias("union_est"),
            est_i.alias("inter_est"),
            jac.alias("jaccard_est"),
            "n_inter_exact",
            "n_union_exact",
        )
    )


def kmv_set_ops_sql(
    table: str, cond_a: str, cond_b: str, value_col: str, k: int = 256
) -> str:
    """DuckDB oracle twin of :func:`kmv_set_ops` (same hash, same
    thresholds, same single-division estimates)."""
    space = float(1 << 32)
    h = token_hash32_sql(f"CAST({value_col} AS VARCHAR)")
    return f"""
    WITH sides AS (
      SELECT DISTINCT side, h FROM (
        SELECT 'a' AS side, {h} AS h FROM {table} WHERE {cond_a}
        UNION ALL
        SELECT 'b' AS side, {h} AS h FROM {table} WHERE {cond_b}
      )
    ),
    kept AS (
      SELECT side, h FROM (
        SELECT side, h, ROW_NUMBER() OVER (PARTITION BY side ORDER BY h) AS rn
        FROM sides
      ) WHERE rn <= {k}
    ),
    theta AS (
      SELECT MIN(CASE WHEN n >= {k} THEN hk ELSE {1 << 32} END) AS theta_scaled
      FROM (SELECT side, COUNT(*) AS n, MAX(h) AS hk FROM kept GROUP BY side)
    ),
    win AS (
      SELECT h, COUNT(*) AS nsides
      FROM kept, theta WHERE h < theta_scaled GROUP BY h
    ),
    state AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS union_kept,
             CAST(SUM(CASE WHEN nsides = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS inter_kept
      FROM win
    ),
    exact AS (
      SELECT CAST(SUM(ina * inb) AS BIGINT) AS n_inter_exact,
             CAST(COUNT(*) AS BIGINT) AS n_union_exact
      FROM (
        SELECT CAST({value_col} AS VARCHAR) AS v,
               MAX(CASE WHEN {cond_a} THEN 1 ELSE 0 END) AS ina,
               MAX(CASE WHEN {cond_b} THEN 1 ELSE 0 END) AS inb
        FROM {table} WHERE ({cond_a}) OR ({cond_b}) GROUP BY 1
      )
    )
    SELECT CAST(theta_scaled AS BIGINT) AS theta_scaled,
           union_kept, inter_kept,
           ROUND(union_kept * {space!r} / theta_scaled, 6) AS union_est,
           ROUND(inter_kept * {space!r} / theta_scaled, 6) AS inter_est,
           ROUND(CASE WHEN union_kept > 0 THEN inter_kept ELSE 0 END
                 / CAST(GREATEST(union_kept, 1) AS DOUBLE), 6) AS jaccard_est,
           n_inter_exact, n_union_exact
    FROM state, theta, exact
    """
