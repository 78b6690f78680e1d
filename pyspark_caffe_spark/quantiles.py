"""Scalable EXACT percentiles — the bounded-memory alternative to
``percentile()``'s buffer-the-whole-group execution.

Spark's exact ``percentile`` (and DuckDB's ``quantile_cont``)
materializes every group's values in the aggregation buffer: at 60M
rows that is gigabytes of heap in the final-agg tasks, and the round-8
100× parity sweep watched it OOM an 8 GB driver heap mid-session
(agg_stats, java.lang.OutOfMemoryError).  At 100 TB it is simply not
runnable.  The standard approximate answer (``percentile_approx``,
mergeable t-digest/KLL) bounds memory but changes the VALUE — useless
when the contract is exactness (an oracle, a billing report, an SLA
percentile).

``exact_percentiles`` computes the SAME interpolated value as
``percentile``/``quantile_cont`` with bounded memory, via
sketch-bracket + exact rank lookup:

1. one aggregate: per-group counts + an approx-percentile BRACKET
   [lo, hi] around each target (probe the sketch at p ± δ);
2. one aggregate: exact conditional counts ``n(val < lo)`` and
   ``n(val ≤ hi)`` per bracket — these PROVE the bracket contains the
   global ranks ⌊k⌋+1 and ⌈k⌉+1 (k = (n−1)·p).  If a sketch error
   pushed a rank outside, widen δ and retry (bounded retries, then
   fall back to the buffering exact percentile — correctness never
   depends on the sketch);
3. rank the BRACKET rows only (a Window over ~δ·n rows per group, not
   n), pick the two straddling values by offset-corrected rank, and
   interpolate ``v_lo·(1−frac) + v_hi·frac`` (frac = k−⌊k⌋) — the
   EXACT floating-point expression Spark's own ``percentile`` uses,
   so results are bit-identical to the built-in (DuckDB's
   ``quantile_cont`` spells the interpolation ``lo + (hi−lo)·frac``,
   which can differ in the last ulp — rounding for oracle comparison
   absorbs that, as it must for the built-in too).

Memory: the sketch is mergeable and bounded; the conditional counts
are scalars; only ~2δ·n rows per group are ever sorted.  Driver state
is O(|groups|·|ps|) — the group count must be bounded (it is the
GROUP-BY cardinality, not the group size), which is the usual shape:
few groups, enormous groups.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: internal column names extra_aggs may not shadow: the stats-pass
#: columns, the built-in path's percentile-array alias ("_p"), and the
#: bracket path's re-emit join key ("_eg") — a collision with any of
#: these surfaced later as an opaque ambiguous-reference
#: AnalysisException instead of the intended ValueError (round-18
#: advisory).  The "p_<i>" OUTPUT names are guarded separately below
#: (they depend on len(ps)).
_RESERVED_STAT_NAMES = frozenset(
    {"g", "v", "_n", "_br", "_vmin", "_vmax", "_p", "_eg"}
)


def exact_percentiles(
    df: DataFrame,
    group_col: str,
    val_col: str,
    ps: list[float],
    accuracy: int = 10_000,
    delta: float = 0.002,
    max_retries: int = 3,
    buffer_threshold: int = 2_000_000,
    max_groups: int = 100_000,
    extra_aggs: "dict[str, Column] | None" = None,
) -> DataFrame:
    """Exact interpolated percentiles per group, bounded memory.

    Returns a DataFrame ``(group_col, p_<i> double ...)`` with one
    column per requested percentile, values identical to
    ``percentile(val_col, p)``.  Requires bounded GROUP COUNT (driver
    keeps O(|groups|·|ps|) bracket specs); group SIZE is unbounded —
    that is the point.

    Size-routed: when every group is under ``buffer_threshold`` values
    (known from the first pass's counts — ~16 MB of buffer at the
    default), the built-in buffering ``percentile`` is cheaper than
    the bracket machinery and is used directly; the bracketed path is
    reserved for the group sizes that would hurt.

    ``extra_aggs`` (round 18): optional ``{name: aggregate Column}``
    of COMPANION aggregates over the normalized frame (group ``g``,
    value ``v``) — e.g. ``{"n": F.count("*")}`` — appended as columns
    to the result and computed in the SAME pass as the percentile
    machinery: the built-in path folds them into its one groupBy; the
    bracketed path rides them on the stats pass and re-emits the
    collected values exactly (doubles/longs round-trip bit-identically
    through the driver).  Callers previously ran a separate full scan
    + join for exactly these aggregates — one whole pass over the
    table at any scale."""
    spark = df.sparkSession
    base = df.select(F.col(group_col).alias("g"), F.col(val_col).alias("v"))
    bad = _RESERVED_STAT_NAMES.intersection(extra_aggs or ())
    # the p_<i> OUTPUT columns are reserved too, up to the requested
    # percentile count (round-18 advisory: "p_0" as an extra_aggs name
    # silently collided with the first percentile's output column)
    bad |= {f"p_{i}" for i in range(len(ps))}.intersection(extra_aggs or ())
    if bad:
        raise ValueError(
            f"exact_percentiles: extra_aggs names {sorted(bad)} collide "
            "with the internal stats-pass or p_<i> output columns"
        )
    extras = [expr.alias(name) for name, expr in (extra_aggs or {}).items()]
    extra_names = list((extra_aggs or {}).keys())

    # routing: a TOTAL row count — metadata-only on a bare parquet
    # scan (zero data columns read), a cheap single-column pass
    # otherwise, and never a shuffle.  total ≤ threshold ⇒ no group
    # can exceed it ⇒ built-in path with no further scans.  Earlier
    # rounds routed on a per-group count aggregate, which cost a FULL
    # extra scan in the big case (the case this module exists for);
    # per-group sizes now ride the stats pass below, so the big case
    # runs one scan fewer (routing advice, round 9).  A many-small-
    # groups frame over a big total pays the stats pass and then still
    # falls back — the acceptable corner.
    if df.count() <= buffer_threshold:
        ok = False
        spec = None
    else:
      for attempt in range(max_retries + 1):
        probes: list[float] = []
        for p in ps:
            probes += [max(0.0, p - delta), min(1.0, p + delta)]
        # per-group stats — ALSO the per-group size source for the
        # final routing check.  limit(max_groups+1) keeps the collect
        # BOUNDED the way vecops caps its broadcast tier: driver state
        # here is O(|groups|·|ps|), so a high-cardinality group key
        # must raise with a route, not OOM the driver.
        stats = (
            base.groupBy("g")
            .agg(
                F.count("v").alias("_n"),
                F.percentile_approx("v", probes, accuracy).alias("_br"),
                F.min("v").alias("_vmin"),
                F.max("v").alias("_vmax"),
                *extras,
            )
            .limit(max_groups + 1)
            .collect()
        )
        if len(stats) > max_groups:
            raise ValueError(
                f"exact_percentiles: more than {max_groups} groups — "
                "driver bracket state is O(|groups|*|ps|) and would not "
                "be bounded. For high-cardinality group keys use "
                "percentile_approx (the mergeable sketch) or raise "
                "max_groups explicitly."
            )
        if all(r["_n"] <= buffer_threshold for r in stats):
            # big total but every individual group small: the built-in
            # buffering path is safe and cheaper than the brackets
            ok = False
            spec = None
            break
        # spec per (group, p): bracket + target ranks.  Groups whose
        # val_col is all-NULL (n == 0) get no bracket — they are
        # re-emitted as null rows at the end (the built-in returns a
        # null row for them, so dropping them would change the result)
        null_groups = [r["g"] for r in stats if r["_n"] == 0]
        spec = []
        for r in stats:
            for i, p in enumerate(ps):
                if r["_n"] == 0:
                    continue
                k = (r["_n"] - 1) * p
                rf, rc = math.floor(k) + 1, math.ceil(k) + 1
                # clamped probes fall back to the exact min/max bound
                lo = r["_vmin"] if p - delta <= 0.0 else r["_br"][2 * i]
                hi = r["_vmax"] if p + delta >= 1.0 else r["_br"][2 * i + 1]
                spec.append(
                    {"g": r["g"], "pi": i, "lo": float(lo), "hi": float(hi),
                     "rf": rf, "rc": rc, "frac": float(k - math.floor(k))}
                )
        if not spec:
            # every group is all-NULL in val_col: zero containment
            # expressions would make agg(*checks) raise — route to the
            # built-in, which returns the per-group null rows
            ok = False
            spec = None
            break
        # exact containment proof: n(v < lo) and n(v ≤ hi) per bracket.
        # eqNullSafe: a NULL group key must still satisfy its own
        # containment proof (g == NULL is never true, which would send
        # the WHOLE frame to the buffering fallback after retries —
        # exactly the OOM path this module exists to avoid)
        checks = []
        for j, s in enumerate(spec):
            gm = F.col("g").eqNullSafe(F.lit(s["g"]))
            checks.append(
                F.sum(F.when(gm & (F.col("v") < s["lo"]), 1).otherwise(0)).alias(f"lt_{j}")
            )
            checks.append(
                F.sum(F.when(gm & (F.col("v") <= s["hi"]), 1).otherwise(0)).alias(f"le_{j}")
            )
        cnt = base.agg(*checks).collect()[0]
        ok = True
        for j, s in enumerate(spec):
            s["below"] = cnt[f"lt_{j}"]
            if not (cnt[f"lt_{j}"] <= s["rf"] - 1 and cnt[f"le_{j}"] >= s["rc"]):
                ok = False
        if ok:
            break
        delta *= 4  # sketch missed: widen the bracket and re-prove
      else:  # pragma: no cover - safety net (retries exhausted)
        spec = None
    if spec is None or not ok:
        # correctness never rides on the sketch: fall back to the
        # buffering exact percentile — ONE array-percentile buffer,
        # not |ps| scalar buffers (small data is the only way to get
        # here in practice)
        arr = F.percentile(
            "v", F.array(*[F.lit(float(p)) for p in ps])
        ).alias("_p")
        return (
            base.groupBy("g")
            .agg(arr, *extras)
            .select(
                F.col("g").alias(group_col),
                *[
                    F.element_at("_p", i + 1).alias(f"p_{i}")
                    for i in range(len(ps))
                ],
                *extra_names,
            )
        )

    spec_df = spark.createDataFrame(
        [(s["g"], s["pi"], s["lo"], s["hi"],
          s["rf"] - s["below"], s["rc"] - s["below"], s["frac"]) for s in spec],
        schema=f"g {base.schema['g'].dataType.simpleString()}, pi int, lo double, "
               "hi double, rf_local long, rc_local long, frac double",
    )
    brkt = base.join(
        F.broadcast(spec_df.withColumnRenamed("g", "sg")),
        F.col("g").eqNullSafe(F.col("sg"))
        & F.col("v").between(F.col("lo"), F.col("hi")),
    )
    w = Window.partitionBy("g", "pi").orderBy("v")
    picked = (
        brkt.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == F.col("rf_local")) | (F.col("rn") == F.col("rc_local")))
        .groupBy("g", "pi", "frac")
        .agg(F.min("v").alias("v_lo"), F.max("v").alias("v_hi"))
        .select(
            "g", "pi",
            # Spark's Percentile.getPercentile spelling, kept verbatim
            # for bit-identical results
            (F.col("v_lo") * (1 - F.col("frac"))
             + F.col("v_hi") * F.col("frac")).alias("val"),
        )
    )
    out = picked.groupBy("g").agg(
        *[F.max(F.when(F.col("pi") == i, F.col("val"))).alias(f"p_{i}")
          for i in range(len(ps))]
    )
    if null_groups:
        nulls = spark.createDataFrame(
            [(g,) for g in null_groups],
            schema=f"g {base.schema['g'].dataType.simpleString()}",
        ).select(
            "g",
            *[F.lit(None).cast("double").alias(f"p_{i}") for i in range(len(ps))],
        )
        out = out.unionByName(nulls)
    if extra_aggs:
        # extras rode the stats pass; re-emit the collected values
        # exactly (IEEE doubles and longs round-trip bit-identically
        # through Row → createDataFrame) and attach by group — no
        # second scan.  Schema comes from the aggregate expressions
        # themselves (analysis only, no job).
        ex_schema = base.groupBy("g").agg(*extras).schema
        emit = spark.createDataFrame(
            [tuple([r["g"], *[r[name] for name in extra_names]]) for r in stats],
            schema=ex_schema,
        ).withColumnRenamed("g", "_eg")
        out = out.join(
            F.broadcast(emit), F.col("g").eqNullSafe(F.col("_eg")), "left"
        ).drop("_eg")
    return out.withColumnRenamed("g", group_col)
