"""Multi-touch attribution beyond last-touch (q231): exact Shapley
values and Markov-chain removal effects.

Public background: Shapley ("A value for n-person games", 1953) as
used by ad-attribution systems (e.g. the Google/Meta data-driven
attribution literature) and the Markov removal-effect model
(Anderl et al., "Mapping the customer journey", 2016).

Scale shape for both: the ONLY row-scale work is one aggregation of
journeys to a tiny model table — 2^d coalition masks for Shapley
(d = #channels, d ≤ ~10 by declared contract), a (d+3)² transition
matrix for Markov. Everything after is arithmetic over that bounded
table; at 100 TB the cost is the journey aggregation scan, exactly
like any groupBy.

Exactness discipline: Shapley values are returned ×d! (factorial
weights become integers — zero float steps end to end); Markov
absorption uses ppm-integer transition probabilities with per-round
floor rescaling (the q326 HITS idiom), so both engines replay the
identical integer recurrence and results hash-match.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def shapley_attribution(
    journeys: DataFrame,
    channels: list[tuple[int, str]],
) -> DataFrame:
    """Exact Shapley attribution over journey coalition masks.

    ``journeys``: one row per journey with ``mask`` (bit-OR of
    touched channel bits) and ``conv`` (0/1). ``channels``:
    (bit, name) pairs; d = len(channels).

    Coalition value v(S) = conversions of journeys whose touched set
    ⊆ S (what the coalition alone could have produced). Output
    ``shapley_xdfact`` is the Shapley value scaled by d! —
    Σ over S∌i of |S|!·(d−1−|S|)!·(v(S∪i) − v(S)) — all integer.
    Efficiency: Σ_i value = d!·(v(full) − v(∅))."""
    d = len(channels)
    if d > 12:
        raise ValueError("Shapley masks are 2^d; d > 12 is a full scan "
                         "of 4096+ coalitions per journey — quantize "
                         "channels first")
    spark = journeys.sparkSession
    mk = journeys.groupBy("mask").agg(
        F.sum("conv").cast("long").alias("n_conv")
    )
    full = (1 << d) - 1
    s = spark.range(0, full + 1).select(F.col("id").cast("int").alias("S"))
    v = (
        s.join(
            mk,
            F.col("mask").bitwiseAND(F.col("S")) == F.col("mask"),
            "left",
        )
        .groupBy("S")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0)).cast("long").alias("v"))
    )
    bits = spark.createDataFrame(
        [(b, n) for b, n in channels], "bit int, channel string"
    )
    # |S|!·(d−1−|S|)! lookup as a CASE chain (d ≤ 12 so exact longs)
    w = F.lit(None).cast("long")
    expr = None
    for k in range(d):
        term = math.factorial(k) * math.factorial(d - 1 - k)
        cond = F.expr("bit_count(S0)") == k
        expr = (
            F.when(cond, F.lit(term))
            if expr is None
            else expr.when(cond, F.lit(term))
        )
    w = expr
    v0 = v.select(F.col("S").alias("S0"), F.col("v").alias("v0"))
    v1 = v.select(F.col("S").alias("S1"), F.col("v").alias("v1"))
    return (
        bits.join(v0, F.col("S0").bitwiseAND(F.col("bit")) == 0)
        .join(v1, F.col("S1") == F.col("S0").bitwiseOR(F.col("bit")))
        .groupBy("channel")
        .agg(
            F.sum(w * (F.col("v1") - F.col("v0")))
            .cast("long")
            .alias("shapley_xdfact")
        )
    )


def markov_removal_effect(
    trans: DataFrame,
    channels: list[str],
    rounds: int = 8,
    conv_state: str = "CONV",
    drop_state: str = "DROP",
) -> DataFrame:
    """Markov-chain attribution (Anderl et al. 2016): channel value =
    how much absorbed conversion mass disappears when the channel
    becomes a dead end.

    ``trans``: (src, dst, c) integer transition counts from observed
    journeys (START → … → CONV/DROP). Probabilities quantize to ppm
    (floor(1e6·c/out)); absorption runs ``rounds`` steps of the
    integer-rescaled recurrence v'[j] = Σ_i (v[i]·p[i][j]) // 1e6
    (the q326 HITS idiom — per-round floors make every engine replay
    the identical integers, so the bounded-horizon absorption is
    hash-exact, not a float fixpoint). One scenario per channel plus
    'full'; removal reroutes the channel's OUTGOING row mass to DROP
    (dead-end semantics: paths touching the channel never convert).

    Monotonicity note: removal can only shrink per-state mass, and
    x ≤ y ⇒ (x·p)//1e6 ≤ (y·p)//1e6, so removal_ppm ≥ 0 always.
    Returns (channel, conv_mass_ppm, removal_ppm). The transition
    table is (d+3)² rows — everything after the journey aggregation
    is arithmetic on a bounded frame."""
    spark = trans.sparkSession
    out_tot = trans.groupBy("src").agg(F.sum("c").alias("tot"))
    tp = trans.join(out_tot, "src").select(
        "src",
        "dst",
        F.expr("CAST(div(1000000 * c, tot) AS BIGINT)").alias("p"),
    )
    scn = spark.createDataFrame(
        [("full", None)] + [(f"no_{c}", c) for c in channels],
        "name string, removed string",
    )
    kept = scn.crossJoin(tp).filter(
        ~F.col("src").eqNullSafe(F.col("removed"))
    ).select("name", "src", "dst", "p")
    dead = scn.filter(F.col("removed").isNotNull()).select(
        "name",
        F.col("removed").alias("src"),
        F.lit(drop_state).alias("dst"),
        F.lit(1_000_000).cast("long").alias("p"),
    )
    absorbing = spark.createDataFrame(
        [(conv_state,), (drop_state,)], "st string"
    )
    loops = scn.crossJoin(absorbing).select(
        "name",
        F.col("st").alias("src"),
        F.col("st").alias("dst"),
        F.lit(1_000_000).cast("long").alias("p"),
    )
    tm = kept.unionByName(dead).unionByName(loops).localCheckpoint(
        eager=True
    )
    v = scn.select(
        "name",
        F.lit("START").alias("state"),
        F.lit(1_000_000).cast("long").alias("v"),
    )
    for _ in range(rounds):
        v = (
            v.alias("vv")
            .join(
                tm.alias("tt"),
                (F.col("vv.name") == F.col("tt.name"))
                & (F.col("vv.state") == F.col("tt.src")),
            )
            .select(
                F.col("tt.name").alias("name"),
                F.col("tt.dst").alias("state"),
                F.expr("CAST(div(vv.v * tt.p, 1000000) AS BIGINT)").alias(
                    "v"
                ),
            )
            .groupBy("name", "state")
            .agg(F.sum("v").cast("long").alias("v"))
        )
    reached = v.filter(F.col("state") == conv_state).select("name", "v")
    # a scenario whose CONV mass is exactly zero produces no row in
    # the propagation output — it still owes a (channel, 0) answer
    conv = scn.select("name").join(reached, "name", "left").select(
        "name", F.coalesce("v", F.lit(0)).cast("long").alias("v")
    )
    fv = conv.filter(F.col("name") == "full").select(
        F.col("v").alias("fv")
    )
    return (
        conv.filter(F.col("name") != "full")
        .crossJoin(F.broadcast(fv))
        .select(
            F.regexp_replace("name", "^no_", "").alias("channel"),
            F.col("v").alias("conv_mass_ppm"),
            F.expr(
                "CAST(div(1000000 * (fv - v), fv) AS BIGINT)"
            ).alias("removal_ppm"),
        )
    )
