"""Data-quality validation and column profiling — the checks an ETL
flow runs before trusting a load (referential integrity, uniqueness,
range rules) and the one-pass profile that feeds monitoring.

Reference parity: DataflowEx flows validate records in-stream and
route rejects (SURVEY §2 A5 left-over routing handles the row-level
form); these operators are the table-level audit a warehouse load
adds on top.

Scale shape: every rule is a keyed anti-join or a single aggregate —
no collects, no windows over the full table. The profile's exact
COUNT(DISTINCT) per column compiles to one Expand-based pass (rows ×
profiled columns inside the scan stage); at extreme width×volume,
pass ``exact=False`` to swap in HLL sketches (approx_count_distinct)
and drop the Expand.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def ri_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Child rows whose key has no match in the parent (orphans)."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key groups that occur more than once (uniqueness breach)."""
    return (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def rule_report(rules: dict[str, DataFrame]) -> DataFrame:
    """Collapse named violation frames into one (rule, n_violations)
    report — each rule is a count aggregate, unioned lazily into a
    single plan (one job, not len(rules) jobs)."""
    parts = [
        df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).alias("n_violations"),
        )
        for name, df in rules.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """One-pass column profile: per column the row count, non-null
    count, distinct count, and min/max rendered as strings (so one
    long-form report covers heterogeneous types).

    ``exact=True`` uses exact COUNT(DISTINCT) — multiple distinct
    aggregates in one pass cost an Expand (rows × columns); at 100 TB
    width, ``exact=False`` switches to approx_count_distinct (HLL,
    mergeable, no Expand).
    """
    cols = cols or df.columns
    nd = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_val"),
            F.col(f"__max_{c}").alias("max_val"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def sigma_outliers(
    df: DataFrame, group_col: str, value_col: str, k: float = 3.0
) -> DataFrame:
    """Per-group k-sigma outlier report: moments accumulated as EXACT
    decimal sums (a raw double Σx/Σx² is partition-order dependent and
    would flip the cross-engine gate), converted to mean/σ in double
    by a closed form, then one broadcast join back to flag rows.

    Returns (group, n_total, n_outliers). Two aggregates + one small
    join — the fact table is scanned twice but never shuffled beyond
    its group key."""
    d = F.col(value_col).cast("decimal(18,2)")
    s = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(d).alias("s1"),
        F.sum(d * d).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    b = s.select(
        group_col,
        mean.alias("mean"),
        F.sqrt(
            F.greatest(
                F.col("s2").cast("double") / F.col("n") - mean * mean,
                F.lit(0.0),
            )
        ).alias("sigma"),
    )
    flagged = df.join(F.broadcast(b), group_col)
    return flagged.groupBy(group_col).agg(
        F.count("*").alias("n_total"),
        F.sum(
            F.when(
                F.abs(F.col(value_col) - F.col("mean"))
                > F.lit(k) * F.col("sigma"),
                1,
            ).otherwise(0)
        ).alias("n_outliers"),
    )


class DataQualityError(RuntimeError):
    """Raised by :func:`enforce` — carries the per-rule violation
    counts so orchestrators can alert with specifics."""

    def __init__(self, violations: dict):
        self.violations = violations
        detail = ", ".join(f"{k}={v}" for k, v in violations.items())
        super().__init__(f"data-quality gate failed: {detail}")


def enforce(df, rules: dict, sample: int = 5):
    """HARD data-quality gate: evaluate boolean rule columns and RAISE
    ``DataQualityError`` (with per-rule counts) if any row violates
    any rule — the fail-the-pipeline complement to the reporting-only
    rule audit (q125's `validation_rules` tells you what's wrong;
    this stops a bad batch from publishing).

    ``rules`` maps rule name → Column predicate that must hold for
    every row. One aggregated pass counts all violations (no
    per-rule scans); returns ``df`` unchanged when clean, so it
    composes mid-pipeline: ``publish(enforce(batch, RULES))``."""
    from pyspark.sql import functions as F

    counts = df.agg(
        *[
            F.sum((~pred).cast("long")).alias(name)
            for name, pred in rules.items()
        ]
    ).collect()[0]
    violations = {
        name: counts[name] for name in rules if (counts[name] or 0) > 0
    }
    if violations:
        raise DataQualityError(violations)
    return df


def correlation_matrix(df, cols, round_digits: int = 6):
    """Pairwise Pearson correlations of numeric columns as rows
    ``(col_a, col_b, corr)`` — the profiling step that catches
    redundant features before a training run.

    ONE aggregation computes every pair (k·(k−1)/2 ``corr`` aggregates
    in a single partial+final hash agg pass — one scan, map-side
    combine, no per-pair jobs); the scalar results are unpivoted to
    rows via ``stack``. Bounded output (k² rows), so the unpivot is
    driver-free and broadcast-sized."""
    from pyspark.sql import functions as F

    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]
    ]
    agg = df.agg(
        *[
            F.round(F.corr(a, b), round_digits).alias(f"__c_{a}_{b}")
            for a, b in pairs
        ]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', `__c_{a}_{b}`" for a, b in pairs
    )
    return agg.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr)"
    ).orderBy("col_a", "col_b")


def fd_audit(df, lhs, rhs, top_n: int = 10):
    """Functional-dependency audit: does ``lhs → rhs`` hold, and where
    does it break? The schema-profiling step that catches silently
    denormalized or corrupted dimensions (one customer with two
    nations, one SKU with two brands) before a join fans out.

    Returns the ``top_n`` worst violating keys:
    ``(key, n_vals, majority_val, n_rows)`` — majority_val being the
    repair a majority-vote fixer would apply (ties broken by value
    for determinism). Two hash aggregations (key×val counts → per-key
    rollup) and one per-key argmax window over the violating keys
    only; clean keys never reach the window."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    kv = (
        df.groupBy(
            F.col(lhs).alias("key"), F.col(rhs).alias("val")
        ).agg(F.count("*").alias("n"))
    )
    per_key = kv.groupBy("key").agg(
        F.count("*").alias("n_vals"), F.sum("n").alias("n_rows")
    )
    violating = per_key.filter(F.col("n_vals") > 1)
    w = W.partitionBy("key").orderBy(F.col("n").desc(), F.col("val"))
    majority = (
        kv.join(violating.select("key"), "key", "left_semi")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", F.col("val").alias("majority_val"))
    )
    return (
        violating.join(majority, "key")
        .select("key", "n_vals", "majority_val", "n_rows")
        .orderBy(F.col("n_rows").desc(), F.col("key"))
        .limit(top_n)
    )


def mask_columns(df, policies: dict):
    """Column-level masking for governed exports — the "share the
    table, not the PII" transform. ``policies`` maps column → policy:

    - ``"hash"``: portable md5 (first 16 hex) of the value — stable
      join/group key across engines and exports, but irreversible;
    - ``"partial"``: keep the first 3 characters and replace the rest
      with ``***`` — human-debuggable prefix, no full identifier;
      values of 3 or fewer characters are redacted entirely (``***``)
      so short identifiers are never exported unmasked;
    - ``("bucket", w)``: numeric generalization to width-w buckets
      (floor(x/w)·w) — k-anonymity-style coarsening (see q206);
    - ``"null"``: redact entirely.

    Pure scan-local expressions (md5/substring/floor — codegen, no
    shuffle); unlisted columns pass through untouched."""
    from pyspark.sql import functions as F

    cols = []
    for f in df.schema.fields:
        pol = policies.get(f.name)
        c = F.col(f.name)
        if pol is None:
            cols.append(c)
        elif pol == "hash":
            cols.append(
                F.substring(F.md5(c.cast("string")), 1, 16).alias(f.name)
            )
        elif pol == "partial":
            # values of <= 3 chars would be revealed ENTIRELY by a
            # 3-char prefix — redact them fully instead of leaking
            # the whole short identifier
            s = c.cast("string")
            cols.append(
                F.when(F.length(s) <= 3, F.lit("***"))
                .otherwise(F.concat(F.substring(s, 1, 3), F.lit("***")))
                .alias(f.name)
            )
        elif isinstance(pol, tuple) and pol[0] == "bucket":
            w = pol[1]
            cols.append(
                (F.floor(c / F.lit(w)) * F.lit(w)).cast("double").alias(
                    f.name
                )
            )
        elif pol == "null":
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(f"mask_columns: unknown policy {pol!r}")
    return df.select(*cols)


def suggest_constraints(
    df,
    columns: list[str],
    numeric: set[str] | None = None,
):
    """Deequ-style CONSTRAINT SUGGESTION: profile the frame in ONE
    stacked aggregate pass (null count, distinct count, min per
    column) and emit the data-quality rules the profile supports —
    ``not_null`` when no nulls, ``unique`` when distinct == rows,
    ``non_negative`` when a numeric column's min ≥ 0. Returns a list
    of (column, rule) pairs; pair with a HOLDOUT validation (the
    q365 pattern) so suggestions earn their keep on data they were
    not derived from — suggesting and checking on the same rows is
    circular. One wide agg = one scan regardless of column count."""
    from pyspark.sql import functions as F

    numeric = numeric or set()
    aggs = [F.count("*").alias("__n")]
    for c in columns:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
        if c in numeric:
            aggs.append(F.min(c).alias(f"__mn_{c}"))
    r = df.agg(*aggs).first()
    out = []
    for c in columns:
        if r[f"__null_{c}"] == 0:
            out.append((c, "not_null"))
        if r[f"__nd_{c}"] == r["__n"] - r[f"__null_{c}"] and (
            r[f"__null_{c}"] == 0
        ):
            out.append((c, "unique"))
        if c in numeric and r[f"__mn_{c}"] is not None and (
            r[f"__mn_{c}"] >= 0
        ):
            out.append((c, "non_negative"))
    return out


def validate_constraints(df, rules: list[tuple[str, str]]):
    """Evaluate suggested (column, rule) pairs over a frame in one
    stacked aggregate pass; returns [(column, rule, holds_bool)]."""
    from pyspark.sql import functions as F

    if not rules:
        return []
    aggs = [F.count("*").alias("__n")]
    for i, (c, rule) in enumerate(rules):
        if rule == "not_null":
            aggs.append(
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"__v{i}")
            )
        elif rule == "unique":
            aggs.append(F.countDistinct(c).alias(f"__v{i}"))
            aggs.append(
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"__vn{i}")
            )
        elif rule == "non_negative":
            aggs.append(F.min(c).alias(f"__v{i}"))
        else:
            raise ValueError(f"unknown rule {rule!r}")
    r = df.agg(*aggs).first()
    out = []
    for i, (c, rule) in enumerate(rules):
        if rule == "not_null":
            holds = r[f"__v{i}"] == 0
        elif rule == "unique":
            holds = (
                r[f"__vn{i}"] == 0 and r[f"__v{i}"] == r["__n"]
            )
        else:
            holds = r[f"__v{i}"] is not None and r[f"__v{i}"] >= 0
        out.append((c, rule, bool(holds)))
    return out


def t_closeness(
    df,
    group_cols: list[str],
    bin_col: str,
    ppm_scale: int = 1_000_000,
):
    """t-CLOSENESS audit (Li–Li–Venkatasubramanian, ICDE'07) for an
    ORDERED sensitive attribute already quantized to integer bins:
    per quasi-identifier group, the Earth Mover's Distance between
    the group's bin distribution and the global one. For ordered
    equal-width bins EMD has the closed form
    Σ_b |CDF_g(b) − CDF(b)| / (m−1), computed here ENTIRELY in
    integers: |cum_g·n − cum·n_g| per bin (exact cross-multiplied
    CDF difference), summed, then ONE floor-divide to ppm —
    bit-identical across engines, no float CDFs. Completes the
    k-anonymity (q206) / l-diversity (q354) privacy-audit family:
    l-diversity counts distinct sensitive values; t-closeness bounds
    how much a group's distribution LEAKS relative to the table.

    Plan shape: per-(group,bin) counts, a broadcast-joined full
    group×bin grid (CDFs must align on missing bins), and windows
    PARTITIONED BY group over ≤m bins — no unpartitioned window, no
    collect. Magnitude contract: ppm_scale·Σ|…| must fit a BIGINT
    (Σ ≤ m·n_g·n) — quantize upstream so m stays small; raises would
    be silent overflow, so size n·n_g·m·scale < 2^63 when adopting.
    Returns (group_cols…, n_g, t_ppm)."""
    from pyspark.sql import Window

    g = [F.col(c) for c in group_cols]
    cnt = df.groupBy(*g, F.col(bin_col).alias("__b")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    bins = df.select(F.col(bin_col).alias("__b")).distinct()
    groups = df.groupBy(*g).agg(F.count(F.lit(1)).cast("long").alias("n_g"))
    n = df.count()
    m = bins.count()
    if m < 2:
        raise ValueError("t_closeness needs at least 2 bins")
    grid = groups.crossJoin(F.broadcast(bins))
    full = grid.join(cnt, [*group_cols, "__b"], "left").select(
        *group_cols,
        "n_g",
        "__b",
        F.coalesce(F.col("__c"), F.lit(0)).alias("__c"),
    )
    w = Window.partitionBy(*group_cols).orderBy("__b")
    cumg = full.select(
        *group_cols,
        "n_g",
        "__b",
        F.sum("__c").over(w).alias("__cum_g"),
    )
    # global CDF = Σ over groups of the per-group CDF (the grid is
    # complete, every group carries every bin) — derived from the
    # PARTITIONED window, so no unpartitioned WindowExec anywhere
    gcum = cumg.groupBy("__b").agg(F.sum("__cum_g").alias("__cum"))
    return (
        cumg.join(F.broadcast(gcum), "__b")
        .groupBy(*group_cols, "n_g")
        .agg(
            F.sum(
                F.abs(
                    F.col("__cum_g") * F.lit(n) - F.col("__cum") * F.col("n_g")
                )
            ).alias("__num")
        )
        .select(
            *group_cols,
            "n_g",
            F.expr(
                f"CAST(div({ppm_scale} * __num, n_g * {n} * {m - 1}) "
                "AS BIGINT)"
            ).alias("t_ppm"),
        )
    )
