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
    max_states: int = 128,
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

    HYBRID CUTOVER (the q369 SCC lesson, measured again here): the
    row-scale work — the journey aggregation feeding ``trans`` — is
    distributed; the transition table itself is ≤ max_states² rows
    BY CONTRACT (guarded), and a DataFrame fixpoint over it is pure
    scheduler overhead — 8 rounds × (join+agg) of a ~30-row frame
    cost ~30 s of AQE/broadcast planning in local mode where the
    driver-side integer loop costs microseconds and is bit-identical
    (the oracle replays the SAME recurrence in SQL, so the driver
    path is hash-verified against a distributed implementation every
    correctness run).

    Monotonicity: removal only shrinks per-state mass, and x ≤ y ⇒
    (x·p)//1e6 ≤ (y·p)//1e6, so removal_ppm ≥ 0 always.
    Returns (channel, conv_mass_ppm, removal_ppm)."""
    spark = trans.sparkSession
    rows = trans.select("src", "dst", "c").collect()  # bounded: guarded
    if len(rows) > max_states * max_states:
        raise ValueError(
            f"transition table has {len(rows)} rows — quantize states "
            f"upstream (contract: ≤ max_states²={max_states**2})"
        )
    tot: dict[str, int] = {}
    for r in rows:
        tot[r["src"]] = tot.get(r["src"], 0) + int(r["c"])
    tp = [
        (r["src"], r["dst"], (1_000_000 * int(r["c"])) // tot[r["src"]])
        for r in rows
    ]

    def absorb(removed: str | None) -> int:
        edges: dict[str, list[tuple[str, int]]] = {}
        for src, dst, p in tp:
            if src == removed:
                continue
            edges.setdefault(src, []).append((dst, p))
        if removed is not None:
            edges[removed] = [(drop_state, 1_000_000)]
        for st in (conv_state, drop_state):
            edges[st] = [(st, 1_000_000)]
        v = {"START": 1_000_000}
        for _ in range(rounds):
            nxt: dict[str, int] = {}
            for state, mass in v.items():
                for dst, p in edges.get(state, ()):  # dangling: drops
                    nxt[dst] = nxt.get(dst, 0) + (mass * p) // 1_000_000
            v = nxt
        return v.get(conv_state, 0)

    fv = absorb(None)
    out = []
    for c in channels:
        vc = absorb(c)
        out.append(
            (c, vc, (1_000_000 * (fv - vc)) // fv if fv > 0 else 0)
        )
    return spark.createDataFrame(
        out, "channel string, conv_mass_ppm long, removal_ppm long"
    )
