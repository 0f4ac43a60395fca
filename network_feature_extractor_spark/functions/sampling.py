"""Deterministic sampling (SURVEY.md §2.2 P4).

The reference samples per packet kernel-side with a PRNG
(``ebpf/packet_capture.c:149-175``, rate from ``config/config.yaml:7-9``).
A distributed engine wants the sample to be DETERMINISTIC (re-runs and
oracle checks see the same subset), so the coin flip is a hash
comparison: keep a row iff the first 8 hex chars of md5(key) fall below
``rate * 16^8``. Uniform (md5), reproducible in any SQL engine, and a
pure pushdown-friendly filter — no RNG state, no seed plumbing.

The sampled unit is the hash key: hashing a conversation id keeps or
drops whole conversations (sequence-preserving — the right default for
transcript pipelines); hashing a row-unique turn id reproduces the
reference's lossy per-packet semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8


def sample_bound(rate: float) -> str:
    """Hex threshold such that P(md5-prefix < bound) == rate (to 1/16^8)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(int(rate * 16**_HEX_DIGITS), f"0{_HEX_DIGITS}x")


def keep_expr(key: Column, rate: float) -> Column:
    """Boolean keep-column for a deterministic ``rate`` sample on key."""
    return F.substring(F.md5(key.cast("string")), 1, _HEX_DIGITS) < sample_bound(rate)


def deterministic_sample(df: DataFrame, rate: float, key_col: str) -> DataFrame:
    """Keep ~``rate`` of distinct ``key_col`` values. The mode is the
    key choice: a conversation id samples whole conversations ("conv"
    mode, the sequence-preserving default); a row-unique id (turn id)
    reproduces the reference's per-packet semantics ("turn" mode)."""
    if rate >= 1.0:
        return df
    return df.filter(keep_expr(F.col(key_col), rate))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
    literal_threshold: int = 64,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix control
    (sample source A at 100%, source B at 30%, ...). Same md5-prefix
    coin as ``deterministic_sample``, so re-runs and SQL oracles see the
    identical subset, and a key sampled at rate r in one stratum stays
    sampled at any rate >= r (nested-sample property of a fixed hash).

    Two physical forms, same semantics:
    - <= ``literal_threshold`` strata: a CASE-expression predicate —
      pure filter, codegens, pushes into the scan, no join at all;
    - larger maps: the (stratum, bound) table broadcasts and the filter
      compares against the joined bound — O(1) plan size however many
      strata (a literal CASE over 10k strata would bloat the plan).
    Unknown strata fall back to ``default_rate`` in both forms.
    """
    for s, r in {**rates, "<default_rate>": default_rate}.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    if "_bound" in df.columns:
        raise ValueError(
            "stratified_sample: input already has a '_bound' column "
            "(reserved for the broadcast-join form); rename it first"
        )

    def _bound(r: float) -> str:
        # rate 1.0 needs a bound ABOVE every 8-hex-char prefix; the
        # numeric bound would be the 9-char '100000000', which compares
        # lexicographically BELOW any prefix starting with '2'..'f' —
        # 'g' is one char above the hex alphabet, so every prefix < 'g'
        return "g" if r >= 1.0 else sample_bound(r)

    prefix = F.substring(F.md5(F.col(key_col).cast("string")), 1, _HEX_DIGITS)
    if len(rates) <= literal_threshold:
        bound = None
        for s, r in rates.items():
            bound = (F.when if bound is None else bound.when)(
                F.col(strata_col) == s, F.lit(_bound(r))
            )
        bound = (
            F.lit(_bound(default_rate))
            if bound is None
            else bound.otherwise(F.lit(_bound(default_rate)))
        )
        return df.filter(prefix < bound)
    spark = df.sparkSession
    rdf = spark.createDataFrame(
        [(s, _bound(r)) for s, r in sorted(rates.items())],
        f"{strata_col} string, _bound string",
    )
    return (
        df.join(F.broadcast(rdf), strata_col, "left")
        .filter(prefix < F.coalesce(F.col("_bound"), F.lit(_bound(default_rate))))
        .drop("_bound")
    )


def split_assign(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic, group-integral dataset split (train/val/test).

    The same md5-prefix coin as ``deterministic_sample`` partitions the
    8-hex-digit hash space into contiguous bands, one per label in
    insertion order; a row's split is the band its key's prefix lands
    in. Hashing a GROUP key (conversation id, dedup-cluster keeper id,
    url domain) puts whole groups in ONE split — the train/test leakage
    guard a training pipeline needs so near-duplicates and session
    continuations never straddle splits. Fractions must each be in
    (0, 1] and sum to 1 (±1e-9); the last band is the CASE's
    ``otherwise`` so hash-space rounding (< 1 part in 16^8 per band)
    is absorbed there and every row gets a label.

    100 TB shape: a pure map-side CASE on a hash prefix — zero shuffle,
    zero UDF, codegens; re-runs, retries, and SQL oracles reproduce the
    identical assignment, so the split is stable across pipeline
    versions as long as the key choice is.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    for s, r in fractions.items():
        if not 0.0 < r <= 1.0:
            raise ValueError(f"fraction for split {s!r} must be in (0, 1], got {r}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    prefix = F.substring(F.md5(F.col(key_col).cast("string")), 1, _HEX_DIGITS)
    labels = list(fractions)
    expr = None
    cum = 0.0
    for s in labels[:-1]:
        cum += fractions[s]
        cond = prefix < F.lit(sample_bound(min(cum, 1.0)))
        expr = (F.when if expr is None else expr.when)(cond, F.lit(s))
    expr = F.lit(labels[0]) if expr is None else expr.otherwise(F.lit(labels[-1]))
    return df.withColumn(split_col, expr)


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    flatten_const: float = 0.1,
    weight_col: str | None = None,
    stratum_weights: dict[str, float] | None = None,
) -> DataFrame:
    """Temperature-flattened domain mixing — the multilingual/multi-
    source rebalancing step of a pretraining pipeline (the alpha-
    temperature mixture of public multilingual-LM recipes, here at
    alpha = 0.5): a domain with corpus share p is down-sampled at

        rate(p) = min(1, flatten_const / sqrt(p))

    i.e. kept mass proportional to p^0.5 once the cap binds — heavy
    domains flattened, tail domains kept whole. alpha = 0.5 is the
    deliberate design point because sqrt is IEEE-754 exact-rounded:
    p (one division of exact integer-valued doubles), sqrt(p), the
    rate, and the integer hash bound floor(rate * 2^32) are all
    BIT-IDENTICAL on any IEEE engine — no ln/pow libm ulp, no rounding
    guard needed anywhere. The coin is the same md5-prefix compare as
    ``deterministic_sample`` (here against the integer bound), so the
    kept set is deterministic and nested across rates.

    ``p`` comes from per-stratum totals of ``weight_col`` (token/char
    budgets; row counts when None). Pass ``stratum_weights`` (the same
    totals, from table statistics) to skip the counting pass — then the
    whole operator is one broadcast join + a map-side filter. Strata
    missing from a provided ``stratum_weights`` are kept whole (rate 1:
    an unbudgeted domain is never silently dropped).

    100 TB shape: the counting pass (when needed) is one map-combinable
    agg to a strata-sized frame; rates derive from it via a 1-row total
    cross-joined in (broadcast); the rate table broadcasts back onto
    the corpus and the filter is map-side. Zero corpus shuffles.
    """
    if flatten_const <= 0.0:
        raise ValueError(f"flatten_const must be positive, got {flatten_const}")
    if "_tbound" in df.columns:
        raise ValueError(
            "temperature_sample: input already has a '_tbound' column "
            "(reserved for the broadcast rate table); rename it first"
        )
    spark = df.sparkSession
    if stratum_weights is not None:
        if not stratum_weights:
            raise ValueError("stratum_weights must be non-empty when given")
        import math

        total = float(sum(stratum_weights.values()))
        rows = []
        for s, wgt in sorted(stratum_weights.items()):
            if wgt <= 0:
                raise ValueError(f"weight for stratum {s!r} must be > 0, got {wgt}")
            # identical IEEE ops to the distributed branch below:
            # divide, sqrt, divide, clamp, scale, floor
            rate = min(1.0, flatten_const / math.sqrt(float(wgt) / total))
            rows.append((s, int(math.floor(rate * 4294967296.0))))
        rdf = spark.createDataFrame(rows, f"{strata_col} string, _tbound long")
    else:
        wexpr = (
            F.lit(1).cast("long") if weight_col is None else F.col(weight_col)
        )
        per = df.groupBy(strata_col).agg(
            F.sum(wexpr).cast("double").alias("_w")
        )
        # mirror the explicit-branch validation (r7 ADVICE): a stratum
        # whose weights sum to <= 0 would otherwise yield rate inf/NaN
        # (sqrt of a non-positive share) and silently keep the stratum
        # whole — corrupt weight data must fail loudly in BOTH branches
        per = per.withColumn(
            "_w",
            F.when(
                F.col("_w") > 0, F.col("_w")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("temperature_sample: non-positive weight sum for stratum "),
                        F.col(strata_col),
                    )
                ).cast("double")
            ),
        )
        tot = per.agg(F.sum("_w").alias("_wtot"))
        rate = F.least(
            F.lit(1.0),
            F.lit(float(flatten_const)) / F.sqrt(F.col("_w") / F.col("_wtot")),
        )
        rdf = per.crossJoin(F.broadcast(tot)).select(
            strata_col,
            F.floor(rate * F.lit(4294967296.0)).cast("long").alias("_tbound"),
        )
    pref = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, _HEX_DIGITS), 16, 10
    ).cast("long")
    return (
        df.join(F.broadcast(rdf), strata_col, "left")
        .filter(pref < F.coalesce(F.col("_tbound"), F.lit(4294967296)))
        .drop("_tbound")
    )
