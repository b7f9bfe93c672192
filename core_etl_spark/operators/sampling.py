"""Deterministic corpus sampling for training-data mixing.

Domain/language mixing wants *reproducible* per-stratum sampling: the same
corpus and rates must select the same documents on every run, every engine,
and every retry — ``df.sample()`` (per-partition RNG, order-dependent) gives
none of that. The hash-gate trick does: a document is kept iff the first 8
hex chars of ``md5(salt:key)`` fall below the stratum's rate threshold.

- **Deterministic**: pure function of (salt, key) — retries, speculative
  tasks, and re-runs agree row-for-row.
- **Engine-portable**: md5 hex is identical in Spark and DuckDB, so the
  oracle replays the exact selection (lexicographic compare on fixed-width
  lowercase hex == numeric compare on the 32-bit prefix).
- **Scale-shape**: one narrow filter pass, no shuffle, no RNG state; rate
  changes recompose (a 1% sample is a strict subset of a 10% sample with
  the same salt — handy for nested eval/train splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HEX_SPACE = 16**8

#: Bounded-strata contract (r15, VERDICT r14 item 3): the threshold-driven
#: samplers (:func:`mixture_rebalance`, :func:`temperature_sample`) collect
#: one (stratum, count) row per stratum to the DRIVER to compute integer
#: gate thresholds. That is correct for their intended strata — language,
#: source/domain-class, quality bucket: at most a few thousand values — but
#: a caller passing a high-cardinality column (url, doc_id, domain) would
#: blow up the driver with no warning. The guard bounds the collect and
#: raises loudly past this cap instead.
MAX_STRATA = 10_000


def _strata_counts(df: DataFrame, strata_col: str, caller: str) -> dict:
    """Per-stratum row counts as a driver-side dict, under the
    bounded-strata contract: the collect is LIMIT-bounded to
    ``MAX_STRATA + 1`` rows (the aggregate itself is distributed and
    cardinality-proof; only the driver materialization needs the cap) and
    exceeding the cap raises ``ValueError`` naming the offending column —
    the loud alternative to an unbounded ``collect()`` (ADVICE r14)."""
    rows = df.groupBy(strata_col).count().limit(MAX_STRATA + 1).collect()
    if len(rows) > MAX_STRATA:
        raise ValueError(
            f"{caller}: column {strata_col!r} has more than {MAX_STRATA} "
            "distinct strata — per-stratum thresholds are a driver-side "
            "dict, so strata must be low-cardinality (language, domain "
            "class, quality bucket). Bucket the column first, or raise "
            "sampling.MAX_STRATA if the cardinality is intentional."
        )
    return {r[0]: r[1] for r in rows}


def _gate_hex(key_col: str, salt: str) -> F.Column:
    """The module's ONE hash-gate recipe: first 8 hex chars of
    ``md5(salt || ':' || key)``. Shared so the expression (and a future
    recipe change) lives in one place — five hand-copies had already let
    the NULL policy drift between functions (r16 review).

    NULL-key policy (Rule 1, r15): ``concat`` null-propagates, so a NULL
    key yields a NULL gate. Every caller must EXCLUDE NULL keys
    explicitly — an undefined identity has no deterministic hash, and
    letting the NULL gate flow into comparisons/windows routes such rows
    somewhere arbitrary (all-WHENs-false branch, NULL window partition)
    differently per engine."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string"))),
        1,
        8,
    )


def _admit_by_thresholds(
    df: DataFrame,
    thresholds: dict,
    strata_col: str,
    key_col: str,
    salt: str,
) -> DataFrame:
    """Admit rows whose 32-bit md5 gate falls below their stratum's
    integer threshold, dispatched via a BROADCAST JOIN on a tiny
    thresholds frame — not a chained ``F.when`` (one CASE branch per
    stratum degenerates at 10k+ strata; a broadcast join is
    strata-count-proof, ADVICE/VERDICT r06). Strata absent from
    ``thresholds`` (including NULL) are dropped by the inner join."""
    spark = df.sparkSession
    thr_df = spark.createDataFrame(
        [(s, int(t)) for s, t in thresholds.items()], ["_stratum", "_thr"]
    )
    gate = F.conv(_gate_hex(key_col, salt), 16, 10).cast("long")
    return (
        df.join(F.broadcast(thr_df), F.col(strata_col) == F.col("_stratum"))
        .filter(gate < F.col("_thr"))
        .drop("_stratum", "_thr")
    )


def rate_threshold(rate: float) -> str:
    """Fixed-width lowercase hex threshold for a keep-rate in [0, 1].
    ``rate >= 1`` returns ``"g"``, which sorts above every hex digit, so
    the strict ``<`` gate keeps all rows (no off-by-one at the top)."""
    if rate >= 1.0:
        return "g"
    return format(max(int(rate * _HEX_SPACE), 0), "08x")


def deterministic_stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "mix1",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value → keep fraction (e.g. upsample low-resource
    languages, downsample boilerplate-heavy domains). Unlisted strata
    (including NULL) get ``default_rate``. The salt namespaces the
    selection: different salts give independent samples, the same salt
    gives nested ones.

    The per-stratum threshold dispatches via a LEFT broadcast join on a
    tiny rates frame with a coalesce to the default — not a chained
    ``F.when`` (one CASE branch per stratum degenerates at 10k+ strata;
    same strata-proof form as :func:`_admit_by_thresholds`).
    """
    if rates and any(k is None for k in rates):
        # an equality join never matches NULL, so a None-key rate entry is
        # silently inert (NULL strata get default_rate regardless) —
        # reject it loudly (r16 review)
        raise ValueError(
            "deterministic_stratified_sample: rates must not contain a "
            "None stratum — NULL strata always take default_rate (join "
            "equality never matches NULL)"
        )
    h = _gate_hex(key_col, salt)
    default_thr = F.lit(rate_threshold(default_rate))
    if not rates:
        return df.filter(h < default_thr)
    thr_df = df.sparkSession.createDataFrame(
        [(v, rate_threshold(r)) for v, r in rates.items()], ["_stratum", "_thr"]
    )
    return (
        df.join(F.broadcast(thr_df), F.col(strata_col) == F.col("_stratum"), "left")
        .filter(h < F.coalesce(F.col("_thr"), default_thr))
        .drop("_stratum", "_thr")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    salt: str = "wsample1",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row gets rank key ``ln(u)/w`` with ``u`` a
    md5-derived uniform in the OPEN interval (0, 1), and the top-k keys
    are the sample —
    inclusion probability rises with weight exactly as sequential
    weighted draws would give. This is quality- or length-weighted
    corpus selection ("spend the token budget on the best documents,
    probabilistically") with the module's determinism guarantees: same
    salt, same data → same sample on every engine, every retry.

    ``u = (word32 + 0.5) / 2^32`` is an exact dyadic rational (no float
    parse drift) that keeps u strictly inside (0, 1): the old
    ``(word32 + 1)`` mapping let ``word = 2^32−1`` produce u = 1 and
    rank key exactly 0 — the maximum possible key — so such a row was
    selected ahead of every other row REGARDLESS of its weight, which
    true A-ES (open-interval u) never does (ADVICE r10). Rows with
    ``w <= 0`` are excluded (their key is undefined — matches the A-ES
    domain). Scale shape: one narrow map pass + a global top-k
    (per-partition heads, never a full sort).

    The selected SET is engine-portable: the only cross-engine float op
    is one ``ln`` per row, and a 1-ulp libm disagreement flips the
    selection only if two keys straddle the k-th boundary within 1 ulp —
    probability ~k·2⁻⁵² per run. The rank key itself is NOT exported
    (callers compare membership, not keys), so the tiny divergence
    surface ends at the boundary row.

    ``key_col`` must be UNIQUE per row (every table here carries a
    natural unique id): duplicated keys tie exactly on (rank, key), so
    which copy survives at the k boundary is partition-dependent — the
    same caller invariant every deterministic sampler in this module
    states (r16 review)."""
    # concat (NULL-propagating), not concat_ws (NULL-skipping): with
    # concat_ws every NULL-key row hashed to the same salt-only value and
    # was ADMITTED with a NULL tiebreaker (nondeterministic at the k
    # boundary), while the oracle's `salt || ':' || key` null-propagated
    # and sorted those rows out — a live-verified cross-engine divergence
    # on NULL keys (r15 review). Rule 1: undefined identities are
    # excluded, identically on both sides.
    if k < 0:
        raise ValueError(f"weighted_sample: k must be >= 0, got {k}")
    u = (
        F.conv(_gate_hex(key_col, salt), 16, 10).cast("long") + F.lit(0.5)
    ) / F.lit(float(_HEX_SPACE))
    key = F.log(u) / F.col(weight_col).cast("double")
    w = F.col(weight_col).cast("double")
    return (
        # NaN compares greater than every number in Spark, so `> 0` alone
        # let NaN-weight rows through — and their NaN rank keys sorted
        # ABOVE every real key, unconditionally occupying the sample
        # (live-verified, r15 review). NULL keys have no identity to hash.
        df.filter(F.col(key_col).isNotNull() & (w > 0) & ~F.isnan(w))
        .withColumn("_wkey", key)
        .orderBy(F.col("_wkey").desc(), F.col(key_col))
        .limit(k)
        .drop("_wkey")
    )


def deterministic_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split1",
    split_col: str = "split",
) -> DataFrame:
    """Assign every NON-NULL-keyed row to exactly one named split
    (train/val/test/...) by hash bucket — the reproducible alternative to
    ``randomSplit`` (whose per-partition RNG reshuffles rows whenever
    partitioning changes). Rows with a NULL ``key_col`` are EXCLUDED
    (Rule 1: an undefined identity has no deterministic hash; before
    r16 they all silently landed in the last split), so the output is a
    partition of the non-NULL-keyed input, not of ``df``.

    ``weights`` maps split name → fraction; fractions must sum to ≤ 1
    (any remainder falls into the **last** named split, so weights that
    sum to 1 partition exactly). Same hash-gate scheme as the sampler:
    a row's split is decided by where ``md5(salt:key)``'s 32-bit hex
    prefix falls among the cumulative thresholds — deterministic,
    engine-portable (the oracle replays it), and a narrow projection
    with no shuffle or RNG state. The same salt keeps splits stable as
    the corpus grows: existing docs never migrate between splits when
    new docs arrive (the leakage-safety property randomSplit lacks)."""
    names = list(weights)
    if not names:
        raise ValueError("deterministic_split: weights must name at least one split")
    # Validate up front: a negative weight, or earlier weights already
    # summing past 1, saturates an intermediate threshold at >= 1 ("g",
    # which sorts above all hex) — every later named split would silently
    # receive zero rows instead of failing (ADVICE r05).
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"deterministic_split: negative weight {name}={w}")
    head = sum(weights[n] for n in names[:-1])
    if head > 1.0:
        raise ValueError(
            "deterministic_split: weights before the last split sum to "
            f"{head} > 1 — splits after the excess would be empty"
        )
    total = head + weights[names[-1]]
    if total > 1.0 + 1e-9:
        # the last split receives 1 - head regardless of its stated
        # weight, so a dict totalling > 1 silently mis-allocated it
        # (r15 review): {'train': .5, 'val': .9} gave val 50%, not 90%
        raise ValueError(
            f"deterministic_split: weights sum to {total} > 1 — the last "
            "split would receive less than its stated fraction"
        )
    h = _gate_hex(key_col, salt)
    # chained whens from the lowest cumulative bound upward, so the first
    # matching threshold wins; rows above every bound land in the last split
    bounds = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        bounds.append((name, rate_threshold(cum)))
    expr = F.lit(names[-1])
    for name, bound in reversed(bounds):
        expr = F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
    # Rule 1 (r16 review): a NULL key has no hash, and the NULL gate made
    # every `h < bound` condition falsy — 100% of corrupt/NULL-id rows
    # silently piled into the LAST split (usually the eval split: the
    # worst place for garbage). Excluded, identically in the oracles.
    return df.filter(F.col(key_col).isNotNull()).withColumn(split_col, expr)


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 8,
    key_col: str = "doc_id",
    salt: str = "ep0",
) -> DataFrame:
    """Deterministic global training-order shuffle + shard assignment — the
    last step before a corpus is written out for training: every epoch wants
    the documents in a (reproducible) pseudorandom order, sliced into
    ``n_shards`` balanced output shards that data-loader workers consume
    independently.

    Each NON-NULL-keyed row gets ``shard = int(md5(salt:key)[0:8], 16) %
    n_shards`` and ``pos`` = its 1-based rank within the shard by the
    same hash (key as total tiebreaker); NULL-key rows are EXCLUDED
    (Rule 1, r16 — they used to get a NULL shard and a
    partition-dependent pos, breaking bit-for-bit replay). The salt is
    the epoch seed: a new salt reshuffles, the same salt replays
    bit-for-bit on any engine and any partitioning.

    Scale shape: ONE hash-partition shuffle on ``shard`` + an in-partition
    sort — exactly the ``repartition(n_shards).sortWithinPartitions`` layout
    a sharded writer wants, so the window rank adds no extra exchange over
    the write itself. md5 spreads keys uniformly, so shards stay balanced
    (±sqrt) at any scale; no RNG state, no driver-side ordering.
    """
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError(f"shuffle_shards: n_shards must be >= 1, got {n_shards}")
    h = _gate_hex(key_col, salt)
    shard = (F.conv(h, 16, 10).cast("long") % n_shards).cast("int")
    # underscore-prefixed temp name (module convention): the bare "h"
    # silently clobbered-then-dropped any input column named h (r15)
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return (
        # Rule 1 (r16 review): NULL keys got shard NULL and a partition-
        # dependent pos inside the NULL window partition — breaking the
        # bit-for-bit replay guarantee; excluded, identically in the oracle
        df.filter(F.col(key_col).isNotNull())
        .withColumn("_h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_h")
    )


def mixture_rebalance(
    df: DataFrame,
    targets: dict[str, int],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix3",
) -> tuple[DataFrame, dict[str, int]]:
    """Rebalance a corpus to target mixture proportions by deterministic
    downsampling — the domain/language-mixing step of an LLM data recipe
    (e.g. "the training mix is 4 parts web : 2 parts books : 1 part code"),
    computed so the admitted corpus is the LARGEST one achieving the target
    ratios in expectation.

    ``targets`` maps stratum value → integer weight. The binding stratum is
    the one minimizing ``n_s / w_s`` (it is kept in full); every other
    stratum is thinned to rate ``(w_s * n_bind) / (w_bind * n_s)`` via the
    md5 hash gate. All thresholds are computed in EXACT integer arithmetic
    (``floor(2^32 · w_s · n_m / (w_m · n_s))`` against the 32-bit md5
    prefix), so the selection is bit-reproducible across engines and runs —
    ties between binding candidates are harmless (equal rationals yield
    equal thresholds). Strata absent from ``targets`` are dropped (weight
    0).

    Returns ``(admitted_df, thresholds)`` where ``thresholds`` maps stratum
    → integer gate (useful for logging the realized rates).

    Scale shape: one tiny per-stratum count aggregate (bounded by the
    number of strata — a driver-side dict, not data-sized), then a single
    narrow filter pass. No shuffle of the corpus, no RNG state; the same
    corpus and targets admit the same documents on every engine.

    Bounded-strata contract: ``strata_col`` must be low-cardinality
    (language, domain class, quality bucket — see ``MAX_STRATA``); the
    count is pre-filtered to the target strata and the driver collect is
    capped, raising past the cap rather than blowing up (r15).
    """
    from fractions import Fraction

    if not targets:
        raise ValueError("mixture_rebalance: targets must name at least one stratum")
    for s_name, w in targets.items():
        if not isinstance(w, int) or w <= 0:
            raise ValueError(
                f"mixture_rebalance: weight for {s_name!r} must be a positive int, got {w!r}"
            )
    # Pre-filter to the target strata BEFORE aggregating: untargeted strata
    # are dropped anyway (weight 0), and the isin pushes to the scan — so
    # the count job never shuffles them and the collect is bounded by
    # len(targets) regardless of the column's true cardinality (r15).
    counts = _strata_counts(
        df.filter(F.col(strata_col).isin(list(targets))),
        strata_col,
        "mixture_rebalance",
    )
    missing = [s for s in targets if s not in counts]
    if missing:
        raise ValueError(f"mixture_rebalance: strata absent from corpus: {missing}")
    n_m, w_m = min(
        ((counts[s], targets[s]) for s in targets),
        key=lambda t: (Fraction(t[0], t[1]),),
    )
    thresholds = {
        s: min(_HEX_SPACE, (_HEX_SPACE * targets[s] * n_m) // (w_m * counts[s]))
        for s in targets
    }
    return _admit_by_thresholds(df, thresholds, strata_col, key_col, salt), thresholds


def temperature_sample(
    df: DataFrame,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    salt: str = "temp1",
) -> tuple[DataFrame, dict[str, int]]:
    """Temperature-based mixture flattening: keep stratum *s* with rate
    ``(n_min / n_s)^alpha`` so the admitted corpus's stratum shares are
    proportional to ``n_s^(1-alpha)`` — the multilingual-sampling recipe
    (rare languages keep everything, dominant ones are thinned) used to
    stop high-resource strata drowning the mix.

    ``alpha=0.5`` (the default, and the common published setting) is
    computed as ``floor(2^32 · sqrt(n_min/n_s))``: IEEE division, sqrt,
    and the power-of-two scale are all exactly rounded, so DuckDB
    replays the identical thresholds and the selection is bit-stable
    cross-engine. Other alphas use ``pow`` — fine in production, but not
    oracle-portable (pow is not required to be correctly rounded).

    Returns ``(admitted_df, thresholds)``. Same scale shape as
    :func:`mixture_rebalance`: one stratum-count agg, one narrow filter —
    and the same bounded-strata contract (``MAX_STRATA`` caps the
    driver-side per-stratum dict; a high-cardinality column raises).
    """
    import math

    # NULL-stratum rows can never be admitted (the join/equality gate drops
    # them), so they must not participate in the counts either — a NULL
    # stratum setting n_min would silently over-thin every real stratum
    # (ADVICE r06).
    counts = _strata_counts(
        df.filter(F.col(strata_col).isNotNull()), strata_col,
        "temperature_sample",
    )
    if not counts:
        return df.limit(0), {}
    n_min = min(counts.values())
    thresholds: dict[str, int] = {}
    for s_name, n_s in counts.items():
        if alpha == 0.5:
            rate = math.sqrt(n_min / n_s)
        else:
            rate = (n_min / n_s) ** alpha
        thresholds[s_name] = min(_HEX_SPACE, math.floor(_HEX_SPACE * rate))
    return _admit_by_thresholds(df, thresholds, strata_col, key_col, salt), thresholds
