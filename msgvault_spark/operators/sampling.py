"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-stable only per partitioning — a repartition or a
rerun over different file splits changes the sample. Pipeline sampling must
be a pure function of the ROW (so reruns, backfills, and the oracle agree):
hash the row's key, keep if below the rate threshold.

The hash is a golden-ratio multiplicative step — ``((key % p) * 1327217885)
% p`` with p = 2^31-1 and multiplier ≈ 0.618·p (Fibonacci hashing). Why
this exact shape:
  - engine-portable (xxhash64 etc. are implementation-private);
  - overflow-safe: max intermediate (p-1)·a ≈ 2.8e18 < 2^63-1, and DuckDB
    BIGINT overflow is an ERROR, not a wrap;
  - low-discrepancy on CONSECUTIVE keys: any multiplicative hash is affine,
    so its quality for rate-filtering ids 0..N is set by the wrap stride
    p/a. A small multiplier (e.g. MINSTD's 48271) wraps every ~44k keys —
    a 25% filter then keeps keys in solid runs (measured 30-55% on 20k
    consecutive ids). The golden-ratio multiplier wraps every ~1.6 keys,
    the classic (1-1/φ) equidistribution.
For text keys, hash a stable surrogate id instead.

Stratified quota sampling (cap per group) = window rank by the same hash —
deterministic "random" order within each stratum, exact quota, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_A = 1327217885  # ≈ (1 - 1/φ) · p, odd → invertible mod the prime p
_M = 2147483647  # 2^31 - 1 (prime)


def rowhash(key: Column | str) -> Column:
    """Deterministic uniform-ish hash of a numeric key into [0, 2^31-1).
    SQL twin: ``((key % 2147483647) * 1327217885) % 2147483647``."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.pmod(k.cast("long"), F.lit(_M)) * F.lit(_A), F.lit(_M))


def deterministic_sample(
    df: DataFrame, key: Column | str, rate: float
) -> DataFrame:
    """Keep ~``rate`` of rows, pure function of ``key`` — no shuffle, no
    state; pushes down as an ordinary filter."""
    return df.filter(rowhash(key) < int(rate * _M))


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    key: Column | str,
    quota: int,
) -> DataFrame:
    """At most ``quota`` rows per stratum, chosen by hash order (stable
    across reruns and engines). One shuffle on the strata columns."""
    w = Window.partitionBy(*strata).orderBy(
        rowhash(key).asc(), (F.col(key) if isinstance(key, str) else key).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def weighted_source_mix(
    df: DataFrame,
    source_col: str,
    key: Column | str,
    weights: dict[str, float],
) -> DataFrame:
    """Dataset mixing: per-source keep rates (e.g. wiki 1.0, crawl 0.1).
    Unlisted sources drop. Pure filter — composes with pushdown, no
    shuffle; at 100 TB this is the map-side first stage of corpus prep."""
    rate = F.lit(0)
    for src, w in weights.items():
        rate = F.when(F.col(source_col) == src, F.lit(int(w * _M))).otherwise(rate)
    return df.filter(rowhash(key) < rate)


def train_val_test_split(
    df: DataFrame,
    key: Column | str,
    *,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test') as a pure function of
    the key hash — membership is stable across reruns, repartitions, and
    engines, which is the whole point: a doc must never migrate between
    train and eval when the pipeline is re-run or backfilled. Map-side
    only; the test share is the remainder.

    SQL twin: thresholds floor(train·M) and floor((train+val)·M) on the
    same rowhash expression."""
    if not (0 < train and 0 <= val and train + val < 1):
        raise ValueError(f"bad split fractions train={train} val={val}")
    h = rowhash(key)
    t1 = int(train * _M)
    t2 = int((train + val) * _M)
    return df.withColumn(
        "split",
        F.when(h < t1, F.lit("train"))
        .when(h < t2, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    key: Column | str,
    *,
    target_frac: float = 0.5,
) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-sampling rule of
    Conneau & Lample 2019, T = 2): keep rate per source ∝ n_s^(1/2) / n_s,
    scaled so ~``target_frac`` of the corpus survives — small sources are
    up-weighted relative to their share, big ones down-weighted.

    Derivation stays IN the plan (no collect): per-source counts are a
    partial-agg'd broadcast dim; weights use √n (the one power that is
    IEEE-correctly-rounded everywhere, which keeps the oracle exact) in
    6-dp fixed point so the cross-source total is an order-free integer
    sum. The corpus-side application is a pure map filter.

    Keep rate: r_s = min(1, target_frac · N · w_s / (Σw · n_s)) with
    w_s = floor(√n_s · 10^6); threshold floor(r_s · M) on rowhash(key)."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    counts = counts.withColumn(
        "__w", F.floor(F.sqrt(F.col("__n")) * 1_000_000).cast("long")
    )
    tot = counts.agg(
        F.sum("__n").alias("__tot_n"), F.sum("__w").alias("__tot_w")
    )
    rates = counts.join(F.broadcast(tot)).select(
        F.col(source_col),
        F.floor(
            F.least(
                F.lit(1.0),
                (F.lit(float(target_frac)) * F.col("__tot_n").cast("double")
                 * F.col("__w").cast("double"))
                / (F.col("__tot_w").cast("double") * F.col("__n").cast("double")),
            )
            * _M
        ).cast("long").alias("__thr"),
    )
    return df.join(F.broadcast(rates), source_col).filter(
        rowhash(key) < F.col("__thr")
    ).drop("__thr")


def epoch_upsample(
    df: DataFrame,
    source_col: str,
    key: Column | str,
    epochs: dict[str, float],
) -> DataFrame:
    """Epoch-based source upsampling (the data-recipe knob stated as
    "N epochs of source X per training run"): each row is replicated
    floor(e) times, plus one more when the row's key hash falls under
    frac(e) — so e = 2.5 yields exactly 2 copies for a deterministic
    half of the rows and 3 for the other half. Adds an ``epoch`` column
    (0-based copy index) so downstream shuffles can spread copies.

    Like every operator here, membership is a pure function of the KEY
    (never monotonically_increasing_id or rand()): reruns, backfills,
    and the oracle agree on exactly which rows got the extra epoch.
    Pure map + explode, after scan-side filters; unlisted sources
    default to 1 epoch.

    SQL twin per source: n = floor(e) + (rowhash(key) < frac(e)·M)."""
    whole = F.lit(1)
    frac_keep = F.lit(0)
    for src, e in epochs.items():
        if e <= 0:
            raise ValueError(f"epochs must be > 0, got {src}={e}")
        whole = F.when(F.col(source_col) == src, F.lit(int(e))).otherwise(whole)
        frac_keep = F.when(
            F.col(source_col) == src, F.lit(int((e - int(e)) * _M))
        ).otherwise(frac_keep)
    n_copies = whole + F.when(rowhash(key) < frac_keep, F.lit(1)).otherwise(
        F.lit(0)
    )
    # e < 1 (sub-epoch sampling) makes n_copies 0 for unselected rows;
    # sequence(0, -1) would default to step -1 and yield [0, -1] — two
    # phantom copies — so gate the explode on an empty array instead
    # (plain explode then drops the row, which is the point of e < 1).
    seq = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies - 1)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("epoch", F.explode(seq))


def bounded_stratified_sample(
    df: DataFrame,
    strata: list[str],
    key: str,
    quota: int,
    *,
    salt_buckets: int = 32,
) -> DataFrame:
    """stratified_sample's 100 TB shape: same contract (at most ``quota``
    rows per stratum, chosen by deterministic hash order) WITHOUT a
    per-stratum sort window. The window variant above ships every stratum
    member through one rank partition — fine when strata are small, a
    funnel when one stratum is half the corpus.

    Two-level bottom-k instead (the operators/kmv.py build pattern): level
    1 groups by (strata, salt) where salt = hash(key) mod ``salt_buckets``
    and keeps the ``quota`` hash-smallest members — any global bottom-k
    element is bottom-k within its salt bucket, so no survivor is lost;
    level 2 merges ≤ salt_buckets·quota candidates per stratum. A hot
    stratum fans across ``salt_buckets`` tasks; per-group agg state is the
    bucket's member structs (salting divides it), merged output is
    quota-bounded. Returns the strata columns + ``key``."""
    h = rowhash(key)
    member = F.struct(h.alias("h"), F.col(key).cast("long").alias("k"))
    lvl1 = (
        df.select(*strata, F.col(key))
        .withColumn("__salt", F.pmod(h, F.lit(salt_buckets)))
        .groupBy(*strata, "__salt")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(member)), 1, quota
            ).alias("__cand")
        )
    )
    merged = (
        lvl1.groupBy(*strata)
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("__cand"))), 1, quota
            ).alias("__top")
        )
        .select(*strata, F.explode("__top").alias("__m"))
        .select(*strata, F.col("__m.k").alias(key))
    )
    return merged


def weighted_sample_wor(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    quota: int,
    *,
    salt_buckets: int = 32,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, ``quota`` per
    group — the Efraimidis–Spirakis A-ES scheme (exponential-key order
    statistics): each row draws key = −ln(u)/w from its portable-hash
    uniform u, and the quota smallest keys win; inclusion probability is
    proportional to weight, the draw is rerun-stable and engine-portable.
    The weighted cousin of bounded_stratified_sample, with the SAME
    salted two-level bottom-k (no per-group sort window — a hot group
    fans across ``salt_buckets`` tasks, merge state is quota-bounded).

    Keys are fixed-point nano longs (floor(−ln(u)/w·1e9 + 0.5)); u is a
    single division of exact integers, so both engines draw identical
    keys bit-for-bit.  Rows with weight <= 0 are excluded (they carry no
    mass; −ln(u)/0 is undefined).  Ties break on the id.  Returns
    (group, id, weight, key_nano)."""
    from msgvault_spark.functions.portable import md5_hex6_long

    h = md5_hex6_long(F.col(id_col).cast("string"))
    u = (h + F.lit(1)).cast("double") / F.lit(16777217.0)
    key_nano = F.floor(
        -F.log(u) / F.col(weight_col).cast("double") * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    # preserve the caller's id/weight types in the output: casting to
    # long here would ANSI-fail a string id and silently truncate a
    # fractional weight that the sampling key above consumed in full
    member = F.struct(
        F.col("__key").alias("k"),
        F.col(id_col).alias("i"),
        F.col(weight_col).alias("w"),
    )
    base = (
        df.filter(F.col(weight_col) > 0)
        .select(F.col(group_col), F.col(id_col), F.col(weight_col))
        .withColumn("__key", key_nano)
        .withColumn("__salt", F.pmod(F.col("__key"), F.lit(salt_buckets)))
    )
    lvl1 = base.groupBy(group_col, "__salt").agg(
        F.slice(F.sort_array(F.collect_list(member)), 1, quota).alias(
            "__cand"
        )
    )
    return (
        lvl1.groupBy(group_col)
        .agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("__cand"))), 1, quota
            ).alias("__top")
        )
        .select(F.col(group_col), F.explode("__top").alias("__m"))
        .select(
            F.col(group_col),
            F.col("__m.i").alias(id_col),
            F.col("__m.w").alias(weight_col),
            F.col("__m.k").alias("key_nano"),
        )
    )
