"""Deterministic hash-based sampling (LLM-data-pipeline tier, SURVEY.md
§2.11 ⊕; not in the reference, which always processes full tables).

Why not ``df.sample()``: RNG sampling is neither reproducible across
engines (no oracle) nor stable across retries/partition reshuffles at
scale. Hashing a key column gives a sample that is deterministic, cheap
(narrow, codegen-fused, no shuffle), consistent across engines, and
*monotone*: the p=5% sample is a strict subset of the p=20% sample, which
is exactly what progressive corpus scaling runs want.

Mechanics: keep a row iff the first byte of ``md5(key)`` is below
``num``/256. Lowercase fixed-width hex compares identically as a string
in every engine, so the predicate is just ``substr(md5(k),1,2) < '%02x'``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_byte(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, 2)


def _threshold_hex(num: int) -> str:
    """2-char comparison literal for num/256. num=256 needs a sentinel
    above every hex pair — ``'100'`` would compare LEXICOGRAPHICALLY
    ('ff' < '100' is false as strings), so use 'zz'."""
    if not 0 <= num <= 256:
        raise ValueError("num must be in [0, 256]")
    return "zz" if num == 256 else f"{num:02x}"


def hash_sample(df: DataFrame, key_col: str, num: int, den: int = 256) -> DataFrame:
    """Keep ~``num``/``den`` of rows, chosen by hash of ``key_col``.

    ``den`` must be 256 (one hash byte) — coarser fractions keep the
    predicate a single string compare. Sampling is by KEY: all rows with
    the same key are kept or dropped together (stable for multi-row
    entities).
    """
    if den != 256:
        raise ValueError("den must be 256 (one md5 byte)")
    return df.filter(_hash_byte(F.col(key_col)) < F.lit(_threshold_hex(num)))


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, int],
    default_num: int = 0,
) -> DataFrame:
    """Per-stratum hash sampling: ``fractions`` maps stratum value ->
    num/256 keep-rate; unlisted strata use ``default_num``. One narrow
    filter, no shuffle — the downsample-hot-classes / upweight-rare-classes
    primitive of corpus curation."""
    threshold: Column = F.lit(_threshold_hex(default_num))
    for value, num in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(_threshold_hex(num))
        ).otherwise(threshold)
    return df.filter(_hash_byte(F.col(key_col)) < threshold)


def temperature_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    target_num: int = 1,
    target_den: int = 2,
    resolution: int = 4096,
) -> DataFrame:
    """Temperature-based source rebalancing (the multilingual/multi-source
    resampling of Conneau et al. 2019 §5.1 at alpha=0.5): keep-rate for
    stratum i is ``min(1, T·√pᵢ / (Σⱼ√pⱼ · pᵢ))`` where pᵢ is the stratum
    row count and ``T = N·target_num/target_den`` the target kept total —
    hot sources are downsampled ∝ √p, rare sources pass through whole.

    Engine-exact by construction, so a SQL oracle reproduces the kept set
    bit-for-bit: weights are ``round(sqrt(p))`` quantized to integers
    (IEEE sqrt of an integer-valued double + half-away rounding are
    identical everywhere), all products/sums stay exact int64 < 2^53, the
    single division is correctly rounded on identical operands, and the
    acceptance test compares a fixed 3-hex-char md5 prefix against the
    per-stratum threshold ``floor(rate·4096)`` ('zzz' sentinel at rate=1,
    same trick as ``_threshold_hex``). Plan: one tiny per-stratum agg
    broadcast back onto a narrow filter — no data shuffle."""
    if resolution != 4096:
        raise ValueError("resolution must be 4096 (3 md5 hex chars)")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__p"))
    g = counts.withColumn("__q", F.round(F.sqrt("__p"), 0).cast("long"))
    tots = g.agg(F.sum("__p").alias("__n"), F.sum("__q").alias("__s"))
    rate = F.least(
        F.lit(1.0),
        (F.expr(f"(__n * {target_num}) div {target_den}") * F.col("__q"))
        .cast("double") / (F.col("__s") * F.col("__p")),
    )
    thr_int = F.floor(rate * resolution).cast("long")
    thr = F.when(thr_int >= resolution, F.lit("zzz")).otherwise(
        F.lpad(F.lower(F.hex(thr_int)), 3, "0")
    )
    rates = g.crossJoin(F.broadcast(tots)).select(strata_col, thr.alias("__thr"))
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(F.substring(F.md5(F.col(key_col).cast("string")), 1, 3) < F.col("__thr"))
        .drop("__thr")
    )


def epoch_shuffle_shards(
    df: DataFrame,
    key_col: str,
    seed: int,
    shard_size: int,
    n_buckets: int = 32,
    key_bits: int = 24,
) -> DataFrame:
    """Deterministic epoch shuffle + training-shard assignment: order rows
    by ``md5(seed:key)`` (a different permutation per epoch seed, identical
    across engines and retries) and cut the shuffled order into
    ``shard_size`` chunks. The global position comes from the two-phase
    parallel prefix sum (``operators.prefixsum``) over a constant 1 — NOT a
    single-partition ``row_number`` window, so the sort scales with the
    widest range bucket rather than serializing 100 TB through one task.

    Order key: a hash prefix in the high bits (``60 - key_bits`` bits,
    parsed JVM-side with ``conv``), the key itself in the low ``key_bits``
    bits as the tiebreak — total 60 bits, fits int64. Because the tiebreak
    carries the FULL key, the packed order key is unique whenever keys are
    unique and in ``[0, 2^key_bits)``; hash-prefix collisions resolve by
    key order. Keys outside that range would silently collide on the
    packed key and break the permutation/shard contract, so the expression
    raises at execution time instead (codegen-fused per-row check, no
    extra pass over the data). Widen ``key_bits`` (up to 52) for larger
    key spaces — the hash prefix shrinks correspondingly, which only
    coarsens shuffle uniformity, never correctness.
    Returns the input columns plus ``shuffle_pos`` (1-based) and ``shard``."""
    from census_data_pipeline_spark.operators.prefixsum import running_sum_scalable

    if not 8 <= key_bits <= 52:
        raise ValueError("key_bits must be in [8, 52] (hash prefix needs >= 8 bits)")
    hash_chars = (60 - key_bits) // 4  # hex chars of md5 prefix in the high bits
    key = F.col(key_col).cast("long")
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string")))
    packed = (
        F.conv(F.substring(h, 1, hash_chars), 16, 10).cast("long")
        * F.lit(1 << key_bits)
        + key
    )
    ord_key = _guard_packed_key(key, packed, key_bits, "epoch_shuffle_shards")
    ranked = running_sum_scalable(
        df.withColumn("__ord", ord_key).withColumn("__one", F.lit(1)),
        order_col="__ord",
        value_col="__one",
        output_col="shuffle_pos",
        n_buckets=n_buckets,
    )
    return ranked.select(
        *df.columns,
        F.col("shuffle_pos").cast("long").alias("shuffle_pos"),
        F.expr(f"(shuffle_pos - 1) div {shard_size}").cast("long").alias("shard"),
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, int]],
    output_col: str = "split",
) -> DataFrame:
    """Deterministic exhaustive train/val/test assignment: every row gets
    exactly one split label from ``splits`` — a list of (label, num)
    where num/256 is the split's share and the nums sum to 256. Same
    hash-byte mechanics as ``hash_sample``, so assignment is by KEY
    (multi-row entities travel together), stable across engines/retries,
    and a (label, 13/256) split is a strict subset of the same label at
    26/256. Narrow map-only expression — no shuffle, no RNG."""
    if sum(n for _, n in splits) != 256:
        raise ValueError("split shares must sum to 256 (one md5 byte)")
    byte = _hash_byte(F.col(key_col))
    expr: Column | None = None
    upper = 0
    for label, num in splits:
        upper += num
        cond = byte < F.lit(_threshold_hex(upper))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return df.withColumn(output_col, expr)


def upsample_by_weight(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, int],
    default_weight: int = 1,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Integer upsampling of rare classes: each row in stratum s is
    replicated ``weights[s]`` times (``default_weight`` for unlisted
    strata), with ``copy_col`` ∈ [0, w) distinguishing the copies — the
    upweight-rare-classes complement of ``stratified_hash_sample`` /
    ``cap_per_group``'s downsampling. RNG-free and engine-exact by
    construction: the output is a deterministic function of the input,
    so a SQL oracle reproduces it row-for-row. Map-only fan-out
    (``explode(sequence(...))``), no shuffle; write the result with the
    epoch shuffle if downstream needs copies dispersed."""
    w: Column = F.lit(default_weight)
    for value, n in sorted(weights.items()):
        if n < 1:
            raise ValueError(f"weights must be >= 1, got {n} for {value!r}")
        w = F.when(F.col(strata_col) == value, F.lit(n)).otherwise(w)
    # explode cannot nest inside another expression (e.g. a cast) —
    # generate first, cast in a separate projection
    return df.withColumn(copy_col, F.explode(F.sequence(F.lit(0), w - F.lit(1)))).withColumn(
        copy_col, F.col(copy_col).cast("long")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    cap: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    hash order (md5 of the order key, id tiebreak) — the source-balancing
    primitive of corpus curation: hot sources are truncated to the cap,
    rare sources pass through whole. Hash order makes the kept subset a
    uniform draw that is stable across engines and runs; one shuffle on
    the group key."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        _hash_byte(F.col(order_col)), F.col(order_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    alpha: float = 10.0,
    loo: bool = False,
    output_col: str = "target_enc",
) -> DataFrame:
    """Smoothed target encoding — the categorical-feature workhorse of
    tabular ML: replace a category with the shrunk mean of the target,

        enc(c) = (n_c · mean_c + α · mean_global) / (n_c + α)

    so rare categories pull toward the prior instead of memorizing
    noise. ``loo=True`` switches to the leave-one-out form — each ROW's
    own target is excluded from its category's statistics
    ((sum_c − y) / (n_c − 1) before shrinking) — the standard guard
    against target leakage when the encoding is fit on the training
    split itself; singleton categories fall back to the global mean.

    Scale shape: one groupBy(cat) stats frame (category-cardinality
    rows, broadcast), a 1-row global frame, and a map-only encode join —
    the corpus never shuffles. Encodings round to 6 (engine parity)."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    stats = df.groupBy(cat_col).agg(
        F.count(target_col).alias("__n"),
        F.sum(target_col).alias("__s"),
    )
    glob = df.agg(
        (F.sum(target_col) / F.count(target_col)).alias("__gm")
    )
    out = df.join(F.broadcast(stats), cat_col).crossJoin(F.broadcast(glob))
    if loo:
        n_eff = F.col("__n") - 1
        s_eff = F.col("__s") - F.col(target_col)
        cat_mean = F.when(n_eff > 0, s_eff / n_eff)
        enc = F.when(
            n_eff > 0,
            (n_eff * cat_mean + alpha * F.col("__gm")) / (n_eff + alpha),
        ).otherwise(F.col("__gm"))
    else:
        enc = (
            (F.col("__s") + alpha * F.col("__gm"))
            / (F.col("__n") + alpha)
        )
    return out.withColumn(output_col, F.round(enc, 6)).drop(
        "__n", "__s", "__gm"
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES, Inf. Process. Lett. 2006): each row draws
    a uniform u from its key's md5 (seeded, engine-portable), scores
    ln(u)/w, and the k LARGEST scores win — inclusion probability
    proportional to weight, exactly one pass, no rejection loop.

    The uniform is (hex32 + 0.5) / 2^32 from the first 8 md5 hex chars —
    strictly inside (0,1) so ln never sees 0, and bit-identical in any
    engine that has md5 (DuckDB parses the same hex via '0x'::BIGINT).
    Rows with NULL or non-positive weights are excluded (zero-weight
    items must never win; A-ES assumes w > 0).

    Scale: a narrow per-row score (fused into the scan) + ONE global
    top-k — which Catalyst compiles to TakeOrderedAndProject (per-
    partition heaps of k, driver merges k rows), the same no-sort shape
    as every top-k in this engine. Returns the winners with their
    ``__score`` dropped; deterministic for a given (seed, data)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(
                        ":", F.lit(str(seed)), F.col(key_col).cast("string")
                    )),
                    1, 8,
                ),
                16, 10,
            ).cast("double")
            + F.lit(0.5)
        )
        / F.lit(float(1 << 32))
    )
    w = F.col(weight_col).cast("double")
    scored = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "__score", F.log(u) / w
    )
    return (
        scored.orderBy(F.col("__score").desc(), F.col(key_col))
        .limit(k)
        .drop("__score")
    )


def _guard_packed_key(key, packed, key_bits: int, op: str):
    """Execution-time range guard shared by the packed-order-key users:
    keys outside [0, 2^key_bits) would silently collide on the packed
    key and break the permutation contract, so raise per-row instead
    (codegen-fused check, no extra pass)."""
    return F.when((key >= 0) & (key < F.lit(1 << key_bits)), packed).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"{op}: key out of [0, 2^{key_bits}) — raise key_bits "
                    "to keep the packed order key unique: "
                ),
                key.cast("string"),
            )
        )
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    key_col: str = "doc_id",
    seed: int = 42,
    n_buckets: int = 32,
    key_bits: int = 24,
) -> DataFrame:
    """Per-source TOKEN-budget quota sampling — the mix-building step
    that assembles a training corpus to target size: within each source,
    keep documents in a deterministic seeded-shuffle order until the
    running token count reaches ``budget_tokens``; the document that
    crosses the line is INCLUDED (the budget is reached, not
    undershot), everything after it is dropped. Deterministic across
    engines, retries and epochs (same md5 permutation discipline as
    ``epoch_shuffle_shards``; change ``seed`` for a different draw).
    Returns the kept rows plus ``n_tokens`` and ``cum_tokens``.

    Scale shape: the running token count per source comes from the
    two-phase parallel prefix sum (``operators.prefixsum``) — a
    100 TB source never serializes through one ordered-window task;
    wall-clock scales with the widest hash-range bucket. The keep
    predicate (exclusive prefix < budget) is a map-side filter on the
    summed frame."""
    if budget_tokens < 1:
        raise ValueError("budget_tokens must be >= 1")
    if not 8 <= key_bits <= 52:
        raise ValueError("key_bits must be in [8, 52]")
    clash = {"n_tokens", "cum_tokens"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has output column(s) {sorted(clash)} — rename "
            "them before token_budget_sample (the result would be ambiguous)"
        )
    from census_data_pipeline_spark.operators.prefixsum import (
        running_sum_scalable,
    )

    hash_chars = (60 - key_bits) // 4
    key = F.col(key_col).cast("long")
    h = F.md5(F.concat_ws(":", F.lit(str(seed)),
                          F.col(key_col).cast("string")))
    packed = (
        F.conv(F.substring(h, 1, hash_chars), 16, 10).cast("long")
        * F.lit(1 << key_bits)
        + key
    )
    ord_key = _guard_packed_key(key, packed, key_bits, "token_budget_sample")
    base = df.withColumn("__ord", ord_key).withColumn(
        "__ntok", F.size(F.split(F.col(text_col), " ")).cast("long")
    )
    summed = running_sum_scalable(
        base,
        order_col="__ord",
        value_col="__ntok",
        group_cols=[source_col],
        output_col="cum_tokens",
        n_buckets=n_buckets,
    )
    return (
        summed.filter(F.col("cum_tokens") - F.col("__ntok") < budget_tokens)
        .select(
            *df.columns,
            F.col("__ntok").alias("n_tokens"),
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
        )
    )


def neyman_sample(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """NEYMAN-ALLOCATION stratified sampling (Neyman 1934 — the
    survey-statistics optimum the census literature is built on, and
    the principled way to mix training strata): allocate a fixed
    ``budget`` across strata proportionally to N_h·σ_h (big and
    variable strata get more), then draw each stratum's quota
    DETERMINISTICALLY as its allocation's smallest md5(id) values —
    the module's hash-sampling discipline, so both engines draw the
    identical sample.

    Allocation contract (all deterministic):
    - σ_h = 6-dp population stddev of ``value_col`` (0 for singleton
      strata); if EVERY weight is zero the allocation degrades to
      proportional (w_h = N_h);
    - integerization by LARGEST REMAINDER: floor the raw shares, then
      hand the leftover units to the largest fractional parts (ties to
      the smaller stratum key);
    - each stratum is capped at its population (alloc ≤ N_h) — when
      caps bind the total drawn may fall below ``budget``, by design
      (no iterative redistribution: the contract stays one-pass).

    Returns the sampled rows: (stratum, alloc, id, value).

    Scale shape: one groupBy for the strata stats (a model-sized
    frame that carries the whole allocation arithmetic, window
    included), then ONE data pass ranked by a window PARTITIONED BY
    stratum (parallel across strata, never a global window) keeping
    rank ≤ the broadcast per-stratum quota."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    from pyspark.sql.window import Window

    base = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("id"),
        F.col(value_col).cast("double").alias("value"),
    )
    strata = base.groupBy("stratum").agg(
        F.count("*").alias("__n"),
        F.round(F.coalesce(F.stddev_pop("value"), F.lit(0.0)), 6)
        .alias("__sd"),
    )
    tot = strata.agg(
        F.sum(F.col("__n") * F.col("__sd")).alias("__wsum"),
        F.sum("__n").alias("__ntot"),
    )
    shares = strata.crossJoin(F.broadcast(tot)).select(
        "stratum", "__n",
        F.when(
            F.col("__wsum") > 0,
            F.lit(float(budget)) * (F.col("__n") * F.col("__sd"))
            / F.col("__wsum"),
        )
        .otherwise(
            F.lit(float(budget)) * F.col("__n") / F.col("__ntot")
        )
        .alias("__r"),
    ).select(
        "stratum", "__n", "__r",
        F.floor("__r").cast("long").alias("__base"),
        (F.col("__r") - F.floor("__r")).alias("__frac"),
    )
    rem = shares.agg(
        (F.lit(budget) - F.sum("__base")).alias("__rem")
    )
    wfrac = Window.orderBy(F.col("__frac").desc(), F.col("stratum"))
    alloc = (
        shares.crossJoin(F.broadcast(rem))
        .withColumn("__rk", F.row_number().over(wfrac))
        .select(
            "stratum",
            F.least(
                F.col("__n"),
                F.col("__base")
                + F.when(F.col("__rk") <= F.col("__rem"), F.lit(1))
                .otherwise(F.lit(0)),
            ).alias("alloc"),
        )
        .filter(F.col("alloc") > 0)
    )
    wpick = Window.partitionBy("stratum").orderBy(
        F.md5(F.col("id").cast("string")), F.col("id")
    )
    return (
        base.join(F.broadcast(alloc), "stratum")
        .withColumn("__pick", F.row_number().over(wpick))
        .filter(F.col("__pick") <= F.col("alloc"))
        .select("stratum", F.col("alloc").cast("long").alias("alloc"),
                "id", "value")
    )


def neyman_oracle_sql(
    table: str,
    stratum_sql: str,
    value_sql: str,
    id_sql: str,
    budget: int,
) -> str:
    """DuckDB replica of ``neyman_sample`` — identical 6-dp stddev
    weights, largest-remainder integerization with the same total
    order, per-stratum caps, and the same md5-ranked draw."""
    return f"""
    WITH base AS (SELECT {stratum_sql} AS stratum, {id_sql} AS id,
                         CAST({value_sql} AS DOUBLE) AS value
                  FROM {table}),
    strata AS (SELECT stratum, count(*) AS n,
                      round(coalesce(stddev_pop(value), 0.0), 6) AS sd
               FROM base GROUP BY stratum),
    tot AS (SELECT sum(n * sd) AS wsum, sum(n) AS ntot FROM strata),
    shares AS (SELECT stratum, n, r,
                      CAST(floor(r) AS BIGINT) AS base_alloc,
                      r - floor(r) AS frac
               FROM (SELECT s.stratum, s.n,
                            CASE WHEN t.wsum > 0
                                 THEN {float(budget)!r} * (s.n * s.sd)
                                      / t.wsum
                                 ELSE {float(budget)!r} * s.n / t.ntot
                            END AS r
                     FROM strata s CROSS JOIN tot t) q),
    rem AS (SELECT {budget} - sum(base_alloc) AS v FROM shares),
    alloc AS (SELECT stratum,
                     least(n, base_alloc + CASE WHEN rk <= rem.v
                                                THEN 1 ELSE 0 END)
                       AS alloc
              FROM (SELECT *, row_number() OVER (
                      ORDER BY frac DESC, stratum) AS rk FROM shares) s
              CROSS JOIN rem),
    picked AS (SELECT b.stratum, a.alloc, b.id, b.value,
                      row_number() OVER (PARTITION BY b.stratum
                        ORDER BY md5(CAST(b.id AS VARCHAR)), b.id)
                        AS pick
               FROM base b JOIN alloc a ON a.stratum = b.stratum
               WHERE a.alloc > 0)
    SELECT stratum, CAST(alloc AS BIGINT) AS alloc, id, value
    FROM picked WHERE pick <= alloc
    """


def ht_estimate(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """HORVITZ–THOMPSON estimation over the Neyman sample — the
    design-based estimator that turns the stratified draw back into a
    population statement (the survey-statistics pair: allocate → draw →
    expand): per stratum, the sampled total expands by N_h/n_h, and the
    output carries the TRUE total beside the estimate so the
    estimator's error is part of the contract.

    Returns one row per stratum plus an '<all>' rollup:
    (stratum, n_pop, n_samp, true_total, est_total, err) — totals and
    errors rounded 6 dp; the rollup sums the per-stratum rounded
    estimates (deterministic in both engines).

    Scale shape: the sampler's passes plus one exact per-stratum total
    aggregate; the expansion arithmetic runs on the strata-sized
    frame."""
    samp = neyman_sample(df, stratum_col, value_col, id_col, budget)
    base = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(value_col).cast("double").alias("value"),
    )
    truth = base.groupBy("stratum").agg(
        F.count("*").alias("n_pop"),
        F.round(F.sum("value"), 6).alias("true_total"),
    )
    per = (
        samp.groupBy("stratum")
        .agg(
            F.count("*").alias("n_samp"),
            F.sum("value").alias("__sv"),
        )
        .join(F.broadcast(truth), "stratum")
        .select(
            "stratum",
            F.col("n_pop").cast("long").alias("n_pop"),
            F.col("n_samp").cast("long").alias("n_samp"),
            "true_total",
            F.round(
                F.col("n_pop") / F.col("n_samp") * F.col("__sv"), 6
            ).alias("est_total"),
        )
        .select(
            "*",
            F.round(F.col("est_total") - F.col("true_total"), 6)
            .alias("err"),
        )
    )
    total = per.agg(
        F.sum("n_pop").cast("long").alias("n_pop"),
        F.sum("n_samp").cast("long").alias("n_samp"),
        F.round(F.sum("true_total"), 6).alias("true_total"),
        F.round(F.sum("est_total"), 6).alias("est_total"),
    ).select(
        F.lit("<all>").alias("stratum"),
        "n_pop", "n_samp", "true_total", "est_total",
        F.round(F.col("est_total") - F.col("true_total"), 6).alias("err"),
    )
    return per.unionByName(total)


def ht_oracle_sql(
    table: str,
    stratum_sql: str,
    value_sql: str,
    id_sql: str,
    budget: int,
) -> str:
    """DuckDB replica of ``ht_estimate`` — the sampler's statement as a
    subquery, the same exact truth aggregate, expansion and rounding."""
    samp = neyman_oracle_sql(table, stratum_sql, value_sql, id_sql, budget)
    return f"""
    WITH samp AS ({samp}),
    truth AS (SELECT {stratum_sql} AS stratum, count(*) AS n_pop,
                     round(sum(CAST({value_sql} AS DOUBLE)), 6)
                       AS true_total
              FROM {table} GROUP BY 1),
    per AS (SELECT s.stratum,
                   CAST(t.n_pop AS BIGINT) AS n_pop,
                   CAST(count(*) AS BIGINT) AS n_samp,
                   t.true_total,
                   round(t.n_pop / count(*) * sum(s.value), 6)
                     AS est_total
            FROM samp s JOIN truth t ON t.stratum = s.stratum
            GROUP BY s.stratum, t.n_pop, t.true_total),
    pe AS (SELECT *, round(est_total - true_total, 6) AS err FROM per)
    SELECT stratum, n_pop, n_samp, true_total, est_total, err FROM pe
    UNION ALL
    SELECT '<all>', CAST(sum(n_pop) AS BIGINT),
           CAST(sum(n_samp) AS BIGINT),
           round(sum(true_total), 6), round(sum(est_total), 6),
           round(round(sum(est_total), 6) - round(sum(true_total), 6), 6)
    FROM pe
    """
