"""Rotation MinHash on the whole-stage-codegen path.

Hash function i = md5 hex digest rotated left by 2·i characters; sig[i]
= lexicographic min over the shingle set (hex min == numeric min on the
uniform md5 space).  One digest per shingle instead of k — and, more
importantly for Spark, the computation is laid out as exploded rows so
md5/substring/concat run inside whole-stage codegen with a map-side
partial min aggregation, instead of interpreted per-element lambdas
inside ``transform(...)`` higher-order functions (measured ~25× slower
for the identical result at sf0.1).

Reference semantics: ``core.text.md5_minhash_signature`` (pure Python,
unit-tested); DuckDB oracle formulation: ``plans.queries._minhash_sql``.
All three produce bit-identical signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


#: md5("") — the stable empty-shingle-set sentinel digest whose rotations
#: form the signature when an entity has no shingles (mirrors
#: core.text.md5_minhash_signature's `or [md5(b"").hexdigest()]`).
EMPTY_MD5 = "d41d8cd98f00b204e9800998ecf8427e"


def minhash_frame(df: DataFrame, id_cols: list[str],
                  shingles_col: str = "shingles", k: int = 16) -> DataFrame:
    """(id_cols..., shingles: array<string>) → (id_cols..., mh:
    array<string>[k]).  One shuffle (partial-agg min per rotation).

    Rows with an empty/null shingle array are KEPT (explode_outer) and
    get rotations of md5('') — matching the pure-Python sentinel, so the
    'bit-identical' contract holds at the function boundary instead of
    relying on upstream size(shingles)>0 guards.
    """
    if not 1 <= k <= 16:
        # stride-2 rotations of a 32-hex digest give exactly 16 distinct
        # hash functions; i=16 wraps to the identity and duplicates sig[0]
        raise ValueError(f"rotation MinHash supports 1..16 hashes, got k={k}")
    ex = df.select(*id_cols, F.explode_outer(shingles_col).alias("s")).withColumn(
        "h", F.coalesce(F.md5("s"), F.lit(EMPTY_MD5))
    )
    return minhash_from_rows(ex, id_cols, k=k)


def minhash_from_rows(rows: DataFrame, id_cols: list[str],
                      k: int = 16) -> DataFrame:
    """(id_cols..., h: md5-hex per shingle ROW) → (id_cols..., mh).

    The row-shaped entry point: callers that can produce shingle rows
    with plain codegen expressions (e.g. posexplode of a token index +
    try_element_at — see plans.queries._shingle_rows) skip the
    interpreted higher-order-function array construction entirely
    (measured 13× on the sf0.1 dup-rich corpus).  Duplicate shingle rows
    are harmless (min over duplicates == min over the set); every id
    must contribute ≥ 1 row (the generators guarantee one, possibly-''
    shingle per doc)."""
    if not 1 <= k <= 16:
        raise ValueError(f"rotation MinHash supports 1..16 hashes, got k={k}")
    ex = rows if "h" in rows.columns else rows.withColumn("h", F.md5("s"))
    mins = ex.groupBy(*id_cols).agg(
        *[
            F.min(
                F.concat(
                    F.substring("h", 2 * i + 1, 32 - 2 * i),
                    F.substring("h", 1, 2 * i),
                )
            ).alias(f"m{i}")
            for i in range(k)
        ]
    )
    return mins.select(
        *id_cols, F.array(*[f"m{i}" for i in range(k)]).alias("mh")
    )


def lsh_params(threshold: float, k: int = 16,
               fn_weight: float = 0.5) -> tuple[int, int]:
    """Threshold-driven LSH band structure: choose (bands b, rows r)
    with b·r == k minimizing the weighted S-curve error around the
    target Jaccard ``threshold`` —
    fp area = ∫₀ᵗ 1-(1-sʳ)ᵇ ds (low-similarity pairs that collide; the
    quadratic mass at corpus scale), fn area = ∫ₜ¹ (1-sʳ)ᵇ ds (true
    near-dups that never collide).  The 100 TB user knob is the
    similarity threshold, not a band count: callers state intent
    (t=0.7) and the structure follows; all k paid-for hashes are used
    (b·r == k exactly).  Deterministic closed-form trapezoid integral —
    no randomness, so the DuckDB oracle built from the same derived
    constants stays in lockstep."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    best, best_err = None, None
    for r in range(1, k + 1):
        if k % r:
            continue
        b = k // r
        steps = 200
        fp = fn = 0.0
        for i in range(steps):
            s = (i + 0.5) / steps
            p = 1.0 - (1.0 - s ** r) ** b
            if s < threshold:
                fp += p / steps
            else:
                fn += (1.0 - p) / steps
        err = (1.0 - fn_weight) * fp + fn_weight * fn
        if best_err is None or err < best_err:
            best, best_err = (b, r), err
    return best


def cap_buckets(bands: DataFrame, keys: list[str], max_bucket: int,
                observation=None) -> DataFrame:
    """LSH bucket-size cap (quadratic-blowup guard): drop every bucket
    with more than ``max_bucket`` members before a band self-join — one
    hot bucket (stop-phrase band key) otherwise goes O(B²).  Members of
    a dropped bucket still pair through their other bands, so recall
    degrades gracefully.  Pass an ``Observation`` to account for the
    drops on the join's own execution (no extra job) — no silent caps."""
    counts = bands.groupBy(*keys).agg(F.count("*").alias("n"))
    if observation is not None:
        counts = counts.observe(
            observation,
            F.sum((F.col("n") > max_bucket).cast("long")).alias("dropped_buckets"),
            F.count(F.lit(1)).alias("total_buckets"),
        )
    return bands.join(
        counts.filter(F.col("n") <= max_bucket).select(*keys), keys,
        "left_semi",
    )


def band_keys(sig: DataFrame, id_cols: list[str], band_size: int,
              mh_col: str = "mh") -> DataFrame:
    """Explode a signature into (id_cols..., bucket) band rows —
    bucket = band index # joined band slice."""
    return sig.select(
        *id_cols,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size({mh_col}) div {band_size} - 1),"
                f" b -> concat_ws('|', slice({mh_col}, b * {band_size} + 1,"
                f" {band_size})))"
            )
        ).alias("band_idx", "band_key"),
    ).withColumn("bucket", F.concat_ws("#", "band_idx", "band_key")).drop(
        "band_idx", "band_key"
    )
