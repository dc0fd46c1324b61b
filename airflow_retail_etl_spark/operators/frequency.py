"""Cross-engine-replicable count-min sketch + sketch-pruned heavy hitters.

Extension surface beyond the reference (which counts frequencies exactly
in Postgres GROUP BYs — `/root/reference/dags/retail_pipeline.py:36-45`
is the same count-per-key shape): at 100 TB the frequent-item question
("which tokens / n-grams / URLs appear ≥ T times?") cannot start with a
full key-grain shuffle — token grain is orders of magnitude larger than
the heavy tail it is asked about. The classic answer is the count-min
sketch (Cormode & Muthukrishnan 2005): a depth×width counter matrix
updated at d hashed positions per occurrence, estimating any key's count
as the MIN of its d counters — always an OVERestimate (collisions only
add), never an underestimate, so a sketch-side threshold prunes with
ZERO false negatives and the exact verification runs only on survivors.

Like the rest of this sketch family (`operators/cardinality.py` KMV/HLL,
`functions/bloom.py`), the sketch is deterministic and engine-portable:
positions come from Kirsch–Mitzenmacher double hashing over the two md5
halves (`functions/xhash`), counters are exact integers from one
map-side-combined aggregation, so the SAME sketch — every counter,
every estimate — is reproducible bit-for-bit in Spark and DuckDB,
across partitionings and reruns. The estimates carry the standard CMS
guarantee: true ≤ est ≤ true + εN with prob 1-δ at width=⌈e/ε⌉,
depth=⌈ln 1/δ⌉.

Scale shape:
- build: one linear projection (d positions per occurrence — no
  distinct, no key shuffle), one aggregation whose key space is bounded
  by depth·width (map-side combine ⇒ the shuffle carries ≤ depth·width
  rows per map partition regardless of input size), one dense-array
  fold identical to the Bloom word fold.
- probe: the one-row counter array broadcasts as DATA (32 KB at the
  defaults — never plan literals, the round-9 trap); each partition
  probes locally with a pure projection. The probed side never shuffles.
- heavy hitters: occurrences → map-side probe → filter est ≥ T →
  exact count. The only key-grain shuffle carries occurrences of
  candidate keys (Σ counts of keys whose est ≥ T) instead of the whole
  corpus — the sketch-prune-then-exact-verify pattern.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions import xhash


def _positions(col: Column, depth: int, width: int) -> list[Column]:
    """The d Kirsch–Mitzenmacher counter positions of a value, as INTs in
    [0, width) — LONG-domain arithmetic, bit-identical to the DECIMAL
    derivation (functions/xhash, round 15; same construction as
    functions/bloom._positions over column instead of bit positions).

    Each returned column re-derives the md5 halves of ``col``; inside a
    single Project codegen's subexpression elimination dedups them, but
    a GENERATE (explode) or a JOIN KEY evaluates every element's tree
    independently — d md5 evaluations per row. Those call sites must
    bind the halves in a lower projection and use
    :func:`_bound_positions` instead (measured 3.3× on the CMS build
    explode at 2M rows)."""
    h1, l1 = xhash.md5_u64_hilo(col, 1)
    h2, l2 = xhash.md5_u64_hilo(col, 2)
    return [
        xhash.km_hash_mod(h1, l1, h2, l2, j, width).cast("int")
        for j in range(depth)
    ]


#: bound-column names _with_km_halves introduces (dropped before output)
_KM_COLS = ("__kmh1", "__kml1", "__kmh2", "__kml2")


def _with_km_halves(df: DataFrame, col: Column) -> DataFrame:
    """``df`` plus the four LONG md5 halves of ``col`` as bound columns.

    The four conv/substring derivations share ONE md5 via in-project
    subexpression elimination; downstream expressions reference the
    bound columns, so Catalyst's CollapseProject keeps this projection
    separate (multi-referenced non-cheap aliases are never inlined) and
    every row hashes exactly once regardless of depth/k."""
    h1, l1 = xhash.md5_u64_hilo(col, 1)
    h2, l2 = xhash.md5_u64_hilo(col, 2)
    return df.select(
        "*",
        h1.alias("__kmh1"),
        l1.alias("__kml1"),
        h2.alias("__kmh2"),
        l2.alias("__kml2"),
    )


def _bound_positions(depth: int, width: int) -> list[Column]:
    """The d positions off the bound halves of :func:`_with_km_halves`."""
    return [
        xhash.km_hash_mod(
            F.col("__kmh1"),
            F.col("__kml1"),
            F.col("__kmh2"),
            F.col("__kml2"),
            j,
            width,
        ).cast("int")
        for j in range(depth)
    ]


def cms_build(
    values: DataFrame,
    col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """One-row DataFrame (counters: array<long>, width, depth) holding
    the count-min sketch of ``values[col]`` occurrences (nulls ignored).

    ``counters`` is row-major: row j's counter for position p sits at
    index j·width + p (1-based ``element_at`` offset applied at probe
    time). Dense by construction — absent cells filled with 0 via a
    ``range(depth·width)`` left join, then one ordered collect_list fold
    (depth·width rows, driver-safe at any input size).

    The sketch is LINEAR: cms(A ⊎ B) = cms(A) + cms(B) element-wise, so
    shards build independently and merge with one ``zip_with(+)``
    (test-pinned). NULL never increments — the estimate of a NULL key is
    undefined, matching the Bloom probe's null verdict.
    """
    cells = cms_cells(values, col, width=width, depth=depth)
    return cms_from_cells(
        values.sparkSession, cells, width=width, depth=depth
    )


def cms_cells(
    values: DataFrame,
    col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Sparse CMS cells of ``values[col]`` occurrences: (idx, c) with
    row-major idx = j·width + pos — the sketch's MERGE/PERSISTENCE
    grain (absent cells are zero by omission). Because the sketch is
    linear, cell frames from any sharding of the data (days, batches,
    shards) combine by summing c per idx — never revisiting the data;
    :func:`cms_from_cells` densifies any such union into the probe
    form. This is the ungrouped twin of :func:`cms_cells_by`."""
    v = values.select(F.col(col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    # halves bound BELOW the generate: explode evaluates each array
    # element's tree independently, so inlined positions would hash
    # every row depth times (round 15; explode_outer ≡ explode — the
    # array is a non-empty literal construction — and dodges the
    # InferFiltersFromGenerate re-inlining trap)
    hv = _with_km_halves(v, F.col("v"))
    pos = hv.select(
        F.explode_outer(
            F.array(
                *[
                    (F.lit(j * width) + p).cast("long")
                    for j, p in enumerate(_bound_positions(depth, width))
                ]
            )
        ).alias("idx")
    )
    return pos.groupBy("idx").agg(F.count(F.lit(1)).alias("c"))


def cms_from_cells(
    spark,
    cells: DataFrame,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Densify sparse (idx, c) cells — possibly a UNION of several
    shards'/batches' cell frames — into the one-row
    (counters, width, depth) probe form. Sums per idx first (linear
    merge), fills absent cells with 0 via a range join, then one
    ordered collect_list fold (depth·width rows, driver-safe)."""
    n_cells = depth * width
    summed = cells.groupBy("idx").agg(F.sum("c").cast("long").alias("c"))
    dense = (
        spark.range(n_cells)
        .select(F.col("id").alias("idx"))
        .join(summed, "idx", "left")
        .select("idx", F.coalesce("c", F.lit(0).cast("long")).alias("c"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "c"))),
            lambda s: s["c"],
        ).alias("counters")
    ).select(
        "counters",
        F.lit(width).cast("int").alias("width"),
        F.lit(depth).cast("int").alias("depth"),
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CMS sketches of IDENTICAL (width, depth): element-wise
    counter sum (the sketch is linear — cms(A ⊎ B) = cms(A) + cms(B)),
    so shards/partitions/days build independently and combine without
    revisiting data. One zip_with over two one-row frames."""
    return (
        a.select(
            F.col("counters").alias("__a"), "width", "depth"
        )
        .join(
            b.select(
                F.col("counters").alias("__b"),
                F.col("width").alias("__wb"),
                F.col("depth").alias("__db"),
            ),
            (F.col("width") == F.col("__wb"))
            & (F.col("depth") == F.col("__db")),
        )
        .select(
            F.zip_with(
                "__a", "__b", lambda x, y: x + y
            ).alias("counters"),
            "width",
            "depth",
        )
    )


def cms_probe(
    df: DataFrame,
    col: str,
    cms: DataFrame,
    *,
    width: int = 1024,
    depth: int = 4,
    est_col: str = "cms_est",
) -> DataFrame:
    """``df`` plus a long ``est_col``: the CMS count estimate of the
    row's ``col`` value (min over the d row counters; NULL for NULL
    keys). ``width``/``depth`` must match the build (they ride the
    sketch row too; literals here keep the probe a pure projection).
    The one-row sketch cross-joins broadcast — each partition probes
    locally, the probed side never shuffles."""
    # positions bound as COLUMNS below the cross join (round 15): a
    # caller's filter on est is substituted by PushDownPredicates and
    # sunk into the broadcast cross join's condition — with inline
    # positions that re-evaluated the whole d-position md5 tree per row
    # there; off bound columns the duplicated predicate is just
    # element_at/least, which is nearly free. (A nondeterministic
    # "seal" of est was measured WORSE — it pins one evaluation but
    # knocks the projection out of codegen subexpression elimination:
    # probe stage 40-61 s vs 21 s CPU at sf0.1.)
    pcols = [f"__cmspos{j}" for j in range(depth)]
    hv = _with_km_halves(df, F.col(col).cast("string")).select(
        "*",
        *[
            p.alias(n)
            for n, p in zip(pcols, _bound_positions(depth, width))
        ],
    ).drop(*_KM_COLS)
    probed = hv.crossJoin(
        F.broadcast(cms.select(F.col("counters").alias("__cms_counters")))
    )
    est = F.least(
        *[
            F.element_at(
                F.col("__cms_counters"),
                (F.lit(j * width + 1) + F.col(pcols[j])).cast("int"),
            )
            for j in range(depth)
        ]
    )
    return probed.withColumn(
        est_col,
        F.when(F.col(col).isNotNull(), est).cast("long"),
    ).drop("__cms_counters", *pcols)


def heavy_hitters(
    occurrences: DataFrame,
    col: str,
    *,
    threshold: int | None = None,
    threshold_frac: float | None = None,
    width: int = 1024,
    depth: int = 4,
    cms: DataFrame | None = None,
) -> DataFrame:
    """Exact heavy hitters via sketch pruning: every value of ``col``
    whose EXACT occurrence count ≥ ``threshold``, as
    (value, n_exact, cms_est), ordered by (n_exact DESC, value).

    Two passes over the occurrence stream, neither key-grain:
    1. build the CMS (bounded-key aggregation);
    2. probe each occurrence map-side and keep rows with
       est ≥ threshold — LOSSLESS, because est ≥ true for every key, so
       every occurrence of a truly-heavy key survives (and all-or-none
       per key: the estimate is a function of the value alone).
    The exact count then shuffles only surviving occurrences; a final
    ``n_exact ≥ threshold`` filter drops the sketch's false positives.
    Output is therefore EXACT (sketch-independent), with ``cms_est``
    reported per value as the sketch's audit column (est ≥ n_exact
    always; equality iff the key's d counters are collision-free).

    Pass EXACTLY ONE of ``threshold`` (absolute count) or
    ``threshold_frac`` (fraction of total occurrences — the scale-safe
    definition: an absolute cut saturates as the corpus grows, passing
    ~every key and degrading the prune to a full key-grain shuffle; a
    fractional cut stays selective at any size, measured at sf10 in
    SCALING_HISTORY round 10). The fraction resolves to
    ``max(1, ceil(frac · N))`` via one count — a driver-side SCALAR of
    the same control-flow class as pagerank's node count, not a data
    collect.
    """
    if (threshold is None) == (threshold_frac is None):
        raise ValueError(
            "pass exactly one of threshold / threshold_frac"
        )
    if threshold_frac is not None:
        if not 0.0 < threshold_frac <= 1.0:
            raise ValueError(
                f"threshold_frac must be in (0, 1], got {threshold_frac}"
            )
        n = occurrences.filter(F.col(col).isNotNull()).count()
        threshold = max(1, math.ceil(threshold_frac * n))
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    if cms is None:
        cms = cms_build(occurrences, col, width=width, depth=depth)
    else:
        # a prebuilt sketch of the SAME occurrence multiset (e.g. the
        # streaming fold_cms_batch state summed across batch partitions —
        # bit-identical to the one-shot build because counter sums are
        # exact integers under any grouping). Its geometry MUST match the
        # probe's: mismatched width/depth reads the wrong counter cells,
        # silently voiding the lossless-prune guarantee (est ≥ true) —
        # check the sketch row's own width/depth columns (round-11
        # advice). Materialize the one-row sketch first so the check and
        # the probe's broadcast share one execution of its build subtree
        # (the round-10 materialize-before-broadcast rule).
        cms = cms.localCheckpoint(eager=True)
        geom = cms.select("width", "depth").first()
        if (geom["width"], geom["depth"]) != (width, depth):
            raise ValueError(
                f"prebuilt cms geometry {geom['width']}x{geom['depth']} "
                f"does not match probe width={width} depth={depth}"
            )
    survivors = cms_probe(
        occurrences.select(F.col(col).cast("string").alias("value")),
        "value",
        cms,
        width=width,
        depth=depth,
    ).filter(F.col("cms_est") >= threshold)
    return (
        survivors.groupBy("value")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.min("cms_est").alias("cms_est"),
        )
        .filter(F.col("n_exact") >= threshold)
        .orderBy(F.col("n_exact").desc(), F.col("value"))
    )


def cms_cells_by(
    occurrences: DataFrame,
    col: str,
    group_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Sparse per-group CMS cells: (group_col, idx, c) with idx row-major
    j·width+pos — the grouped sketch's state grain, bounded by
    |groups| · depth · width rows after map-side combine (absent cells
    are zero by omission; a probed key's own occurrences guarantee its
    d cells exist, so inner probe joins never miss).

    ``weight_col``: each row counts as that many occurrences (CMS is
    linear, so cells off a pre-aggregated (group, value, n) grain are
    IDENTICAL to cells off the raw occurrence stream — round 16, the
    weighted-grain contraction rolling_heavy_hitters rides)."""
    cols = [group_col] + ([weight_col] if weight_col else [])
    v = occurrences.select(
        *cols, F.col(col).cast("string").alias("v")
    ).filter(F.col("v").isNotNull())
    # same bound-halves-below-generate rule as cms_cells (round 15)
    hv = _with_km_halves(v, F.col("v"))
    pos = hv.select(
        *cols,
        F.explode_outer(
            F.array(
                *[
                    (F.lit(j * width) + p).cast("long")
                    for j, p in enumerate(_bound_positions(depth, width))
                ]
            )
        ).alias("idx"),
    )
    # coalesce pins the non-nullable schema count(1) had (the group is
    # never empty, so the 0 branch is unreachable)
    c = (
        F.coalesce(F.sum(weight_col), F.lit(0).cast("long"))
        if weight_col
        else F.count(F.lit(1))
    ).alias("c")
    return pos.groupBy(group_col, "idx").agg(c)


def heavy_hitters_by(
    occurrences: DataFrame,
    col: str,
    group_col: str,
    *,
    threshold: int | None = None,
    threshold_frac: float | None = None,
    width: int = 1024,
    depth: int = 4,
    broadcast_cells: bool = True,
) -> DataFrame:
    """Per-group exact heavy hitters via grouped-CMS pruning: every
    (group, value) whose exact in-group count ≥ the group's threshold,
    as (group_col, value, n_exact, cms_est, threshold), ordered by
    (group, n_exact DESC, value). The per-domain boilerplate detector:
    "which n-grams dominate WITHIN each language/source" — a global cut
    either drowns small groups or floods large ones.

    ``threshold_frac`` resolves PER GROUP to
    ``greatest(1, ceil(frac · N_g))`` from one bounded group-total
    aggregation (the scale-safe cut — see :func:`heavy_hitters`);
    ``threshold`` applies one absolute count to every group. Exactly
    one of the two.

    Scale shape: the sparse cell table (|groups| · depth · width rows,
    map-side combined) broadcasts into d map-side probe joins — the
    occurrence stream shuffles ONCE, contracted to the
    (group, value, n) grain with a map-side combine (round 16); the
    prune and the exact count run on that weighted grain, and the same
    overestimate guarantee makes the prune lossless per group.

    ``broadcast_cells`` sizes that design: the cell table is ~16 B ×
    |groups|·depth·width (≈ 1 GB at 10k groups × the defaults) — fine
    for language/source/tier grains, past executor broadcast budgets
    for very fine grains (per-URL-host). Set False there: the probes
    run as shuffle joins on (group, idx) — the occurrence stream
    shuffles d times pre-prune, which only pays when the group grain is
    too fine to broadcast AND the prune is selective; at that grain
    also consider a coarser grouping or the global sketch per shard."""
    if (threshold is None) == (threshold_frac is None):
        raise ValueError(
            "pass exactly one of threshold / threshold_frac"
        )
    from airflow_retail_etl_spark.functions.partitioning import spread

    # weighted-grain contraction + pin (round 16, the
    # rolling_heavy_hitters treatment): the occurrence stream fed THREE
    # passes (cells checkpoint, threshold checkpoint, probe), each
    # re-executing the corpus-sized subtree — and its map side runs on
    # ONE task over a single-row-group source. Aggregate to the
    # (group, value, __w) grain first (map-side combine below that
    # exchange), pin the contracted grain once, and run every pass off
    # the pin. CMS is linear and every aggregate below is a sum, so
    # cells/thresholds/exact counts are bit-identical
    # (test_cms_cells_by_weighted_grain_equals_raw + the oracle).
    occ = (
        spread(
            occurrences.select(
                group_col, F.col(col).cast("string").alias("value")
            )
            .filter(F.col("value").isNotNull())
            .groupBy(group_col, "value")
            .agg(F.count(F.lit(1)).cast("long").alias("__w")),
            "value",
        )
        .localCheckpoint(eager=True)
    )
    cells = cms_cells_by(
        occ, "value", group_col, width=width, depth=depth,
        weight_col="__w",
    ).localCheckpoint(eager=True)
    if threshold_frac is not None:
        if not 0.0 < threshold_frac <= 1.0:
            raise ValueError(
                f"threshold_frac must be in (0, 1], got {threshold_frac}"
            )
        thr = occ.groupBy(group_col).agg(
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(
                    F.lit(threshold_frac)
                    * F.coalesce(F.sum("__w"), F.lit(0))
                ),
            ).alias("__thr")
        ).localCheckpoint(eager=True)  # same rule: |groups| rows
        # feeding a broadcast — pinned so the build is one cheap read
    else:
        if threshold < 1:
            raise ValueError(f"threshold must be >= 1, got {threshold}")
        thr = occ.select(group_col).distinct().select(
            group_col, F.lit(threshold).cast("long").alias("__thr")
        ).localCheckpoint(eager=True)
    def _b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_cells else df

    # positions bound ONCE before the join chain: a join-key expression
    # is evaluated per join, so inlined positions would hash every probe
    # row depth times across the d joins (round 15; the single
    # projection dedups the md5 via subexpression elimination)
    probed = _with_km_halves(
        occ.join(F.broadcast(thr), group_col), F.col("value")
    ).select(
        "*",
        *[
            (F.lit(j * width) + p).cast("long").alias(f"__pos{j}")
            for j, p in enumerate(_bound_positions(depth, width))
        ],
    )
    cols = []
    for j in range(depth):
        cj = _b(
            cells.select(
                F.col(group_col).alias(f"__g{j}"),
                F.col("idx").alias(f"__i{j}"),
                F.col("c").alias(f"__c{j}"),
            )
        )
        probed = probed.join(
            cj,
            (F.col(group_col) == F.col(f"__g{j}"))
            & (F.col(f"__pos{j}") == F.col(f"__i{j}")),
        )
        cols.append(f"__c{j}")
    survivors = probed.withColumn(
        "cms_est", F.least(*[F.col(c) for c in cols])
    ).filter(F.col("cms_est") >= F.col("__thr"))
    return (
        survivors.groupBy(group_col, "value")
        .agg(
            # weight sum ≡ count(1) on the raw grain; coalesce pins
            # count's non-nullable schema
            F.coalesce(F.sum("__w"), F.lit(0))
            .cast("long")
            .alias("n_exact"),
            F.min("cms_est").alias("cms_est"),
            F.min("__thr").alias("threshold"),
        )
        .filter(F.col("n_exact") >= F.col("threshold"))
        .orderBy(group_col, F.col("n_exact").desc(), "value")
    )


def rolling_heavy_hitters(
    occurrences: DataFrame,
    col: str,
    day_col: str,
    *,
    window_days: int = 7,
    threshold_frac: float,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Per-trailing-window exact heavy hitters from PER-DAY CMS cells —
    the rolling face of the sketch family (the CMS twin of
    ``cardinality.hll_registers``' rolling distinct): every value whose
    exact count inside [day − window_days + 1, day] is ≥
    greatest(1, ceil(frac · window occurrences)), one row per
    (window_end, value).

    Why per-day cells: the corpus is scanned ONCE into day-grain sparse
    cells (≤ days · depth · width rows — the sketch's persistence
    grain); every window's sketch is then a calendar²-bounded cell SUM
    (the linear merge), never a rescan. The probe side explodes each
    occurrence into the ≤ ``window_days`` windows containing its day —
    a projection against the broadcast window-cell table — and only
    surviving (window, value) occurrences shuffle for the exact count,
    so the per-window key-grain work is candidates, not corpus. The
    overestimate guarantee holds per window (sums of day cells only
    add), keeping the prune lossless.

    Returns (window_end, value, n_exact, cms_est, threshold) ordered by
    (window_end, n_exact DESC, value); windows exist for every day
    PRESENT in the data (leading windows are partial, like any
    trailing-window metric).
    """
    if not 0.0 < threshold_frac <= 1.0:
        raise ValueError(
            f"threshold_frac must be in (0, 1], got {threshold_frac}"
        )
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    from airflow_retail_etl_spark.functions.partitioning import spread

    occ0 = occurrences.select(
        F.col(day_col).alias("day"),
        F.col(col).cast("string").alias("value"),
    ).filter(F.col("value").isNotNull() & F.col("day").isNotNull())
    # weighted-grain contraction (round 16): the raw occurrence stream
    # repeats each (day, value) pair many times, and a single-row-group
    # parquet source runs the whole scan + exchange write on ONE task
    # (the round-7 input-split trap) — job_profile measured 1.7-1.9 s
    # single-task on that map side at sf0.1. Aggregating to the
    # (day, value, __w) grain FIRST puts a map-side combine below that
    # exchange, so the one-task side emits |distinct pairs| weighted
    # rows instead of every occurrence, and every downstream pass
    # (cells, totals, the ×window_days probe explode, the exact count)
    # hashes/joins the contracted grain. CMS is linear and every
    # aggregate below is a sum, so results are bit-identical
    # (test-pinned against the raw-grain form). spread() pins the
    # post-agg parallelism (AQE would coalesce the small grain to one
    # partition — the CLAUDE.md bytes-blind trap), and the eager
    # localCheckpoint materializes the grain ONCE: it feeds the cells
    # checkpoint, the totals checkpoint, AND the probe stream, and each
    # of those re-executed the whole single-task scan+aggregate subtree
    # (~2 s apiece at sf0.1 — A/B measured 5.1-6.0 s unpinned vs
    # 3.1-3.9 s pinned, the r10 materialize-before-reuse law on the
    # contracted |days|·|keys| grain, the sketch's own state-size
    # class; MEMORY_AND_DISK, so an at-scale grain spills, not OOMs).
    occ = spread(
        occ0.groupBy("day", "value").agg(
            F.count(F.lit(1)).cast("long").alias("__w")
        ),
        "value",
    ).localCheckpoint(eager=True)
    # day-grain state, materialized before the broadcasts it feeds
    # (bounded rows off a corpus-sized subtree — the round-10 rule)
    cells = cms_cells_by(
        occ, "value", "day", width=width, depth=depth, weight_col="__w"
    ).localCheckpoint(eager=True)
    totals = (
        occ.groupBy("day")
        .agg(
            F.coalesce(F.sum("__w"), F.lit(0))
            .cast("long")
            .alias("__dn")
        )
        .localCheckpoint(eager=True)
    )
    days = totals.select(F.col("day").alias("wd"))
    span = F.date_sub(F.col("wd"), window_days - 1)
    mapping = days.join(
        totals.select(F.col("day").alias("__d"), "__dn"),
        (F.col("__d") >= span) & (F.col("__d") <= F.col("wd")),
    )
    thr = mapping.groupBy("wd").agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.lit(threshold_frac) * F.sum("__dn")),
        ).alias("__thr")
    )
    # two round-15 fixes on the window-merged cell table, both measured
    # in the executed plan:
    # - spread the merge aggregation: its input is |windows|·|days in
    #   window|·(depth·width) small rows and AQE sizes the exchange by
    #   BYTES — it collapsed to ONE task for 3.1 s at sf0.1 (the
    #   CLAUDE.md coalesce trap, aggregation face);
    # - localCheckpoint BEFORE the d broadcast probe joins: the plan
    #   showed the whole merge subtree replicated FOUR times (one per
    #   broadcast build — exchange reuse does not dedup across the
    #   aliased builds), the r10 materialize-before-broadcast law.
    from airflow_retail_etl_spark.functions.partitioning import spread

    wcells = (
        spread(
            mapping.select("wd", F.col("__d").alias("day")).join(
                cells, "day"
            ),
            "wd",
            "idx",
        )
        .groupBy("wd", "idx")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint(eager=True)
    )
    # km halves + positions bound ON THE CONTRACTED GRAIN, BEFORE the
    # window explode (round 16): the double-md5 depends only on value,
    # so hashing above the ≤window_days broadcast explode re-hashed
    # every row ×windows — the r15 bound-positions rule pushed one
    # level further down. The halves/positions ride the explode as
    # plain longs.
    hocc = _with_km_halves(occ, F.col("value")).select(
        "*",
        *[
            (F.lit(j * width) + p).cast("long").alias(f"__pos{j}")
            for j, p in enumerate(_bound_positions(depth, width))
        ],
    )
    wocc = hocc.join(
        F.broadcast(mapping.select("wd", F.col("__d").alias("day"))),
        "day",
    )
    probed = wocc.join(F.broadcast(thr), "wd")
    colnames = []
    for j in range(depth):
        cj = F.broadcast(
            wcells.select(
                F.col("wd").alias(f"__w{j}"),
                F.col("idx").alias(f"__i{j}"),
                F.col("c").alias(f"__c{j}"),
            )
        )
        probed = probed.join(
            cj,
            (F.col("wd") == F.col(f"__w{j}"))
            & (F.col(f"__pos{j}") == F.col(f"__i{j}")),
        )
        colnames.append(f"__c{j}")
    survivors = probed.withColumn(
        "cms_est", F.least(*[F.col(c) for c in colnames])
    ).filter(F.col("cms_est") >= F.col("__thr"))
    return (
        survivors.groupBy(F.col("wd").alias("window_end"), "value")
        .agg(
            # each contracted row carries __w occurrences — the exact
            # count is the weight sum (≡ count(1) on the raw grain;
            # coalesce pins count's non-nullable schema)
            F.coalesce(F.sum("__w"), F.lit(0))
            .cast("long")
            .alias("n_exact"),
            F.min("cms_est").alias("cms_est"),
            F.min("__thr").alias("threshold"),
        )
        .filter(F.col("n_exact") >= F.col("threshold"))
        .orderBy("window_end", F.col("n_exact").desc(), "value")
    )
