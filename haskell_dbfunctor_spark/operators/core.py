"""The relational operator kernel — SURVEY.md §2 re-expressed as thin,
explicit functions over DataFrames.

Each function maps 1:1 to a reference operator (citations inline) but
lowers to a declarative Catalyst plan: equi-join predicates become
hash/sort-merge/broadcast joins, group-bys become partial+final hash
aggregates, sorts become range-partitioned distributed sorts — the
reference executes all of these as single-threaded O(n·m) nested loops
(/root/reference/src/RTable/Core.hs:2704-2715, :3039, :3317-3319).

Deliberate, documented divergences from the reference (SURVEY.md §1.2):
- count(all-NULL column) = 0 (Spark/SQL), not NULL (countFold,
  Core.hs:2106-2125).
- projecting a missing column raises (Spark), instead of returning an
  empty table (runProjection, Core.hs:2535-2559); the tolerant path is
  project_missed_hits, which matches runProjectionMissedHits.
- union() has SQL UNION semantics (global dedup); the reference keeps
  pre-existing duplicates of the left operand (Core.hs:3004-3005).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F, types as T


class UniquenessViolationInUpsert(Exception):
    """MERGE source not unique on match columns.

    Reference: /root/reference/src/RTable/Core.hs:4417-4419, check at
    :3700-3708.
    """


# --------------------------------------------------------------------
# projection / filter / row-level  (reference §2.2)
# --------------------------------------------------------------------

def rfilter(df: DataFrame, pred: Column) -> DataFrame:
    """σ — runRfilter / f (Core.hs:2517-2528)."""
    return df.where(pred)


def project(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """π — runProjection / p (Core.hs:2535-2559); missing column raises."""
    return df.select(*cols)


def project_missed_hits(
    df: DataFrame, cols: Sequence[str], missing_type: str = "string"
) -> DataFrame:
    """π with missing columns as typed NULL — runProjectionMissedHits
    (Core.hs:2565-2584). This is the schema-evolution read path; the
    reference's UknownType for all-Null columns becomes an explicit
    ``missing_type`` because Spark nulls are typed."""
    return df.select(
        *[
            F.col(c) if c in df.columns else F.lit(None).cast(missing_type).alias(c)
            for c in cols
        ]
    )


def limit(df: DataFrame, n: int) -> DataFrame:
    """limit (Core.hs:2587-2591)."""
    return df.limit(n)


def add_column(df: DataFrame, name: str, value) -> DataFrame:
    """addColumn (Core.hs:2505-2513) — constant default for every row."""
    return df.withColumn(name, value if isinstance(value, Column) else F.lit(value))


def remove_column(df: DataFrame, name: str) -> DataFrame:
    """removeColumn (Core.hs:2495-2502) — no-op if absent."""
    return df.drop(name)


# --------------------------------------------------------------------
# joins  (reference §2.3)
# --------------------------------------------------------------------
# All reference joins are theta-joins with Oracle-style collision
# renames: right-side columns that clash get _1 (then _2, ...) suffixes
# (joinRTuples Core.hs:2724-2762, getUniqueColumnNamesAfterJoin
# :2872-2887). `on` is a list of column names (equi) or a callable
# (left_df, right_df) -> Column for arbitrary theta predicates.

OnSpec = Sequence[str] | Callable[[DataFrame, DataFrame], Column]


def _suffix_map(left_cols: Sequence[str], right_cols: Sequence[str]) -> dict[str, str]:
    taken = set(left_cols)
    out = {}
    for c in right_cols:
        new = c
        i = 0
        while new in taken:
            i += 1
            new = f"{c}_{i}"
        taken.add(new)
        out[c] = new
    return out


class _SideProxy:
    """Alias-qualified column access for join predicates — makes theta
    predicates unambiguous even for self-joins (Spark resolves
    `__jl.c` / `__jr.c` through the Dataset alias)."""

    def __init__(self, prefix: str, cols: Sequence[str]):
        self._prefix = prefix
        self.columns = list(cols)

    def __getitem__(self, name: str) -> Column:
        return F.col(f"{self._prefix}.{name}")

    def __getattr__(self, name: str) -> Column:
        if name.startswith("_"):
            raise AttributeError(name)
        return F.col(f"{self._prefix}.{name}")


def _build_cond(on: OnSpec, l_cols: Sequence[str], r_cols: Sequence[str]) -> Column:
    lp, rp = _SideProxy("__jl", l_cols), _SideProxy("__jr", r_cols)
    if callable(on):
        return on(lp, rp)
    cond = None
    for c in on:
        eq = lp[c] == rp[c]
        cond = eq if cond is None else cond & eq
    return cond


def _join(l: DataFrame, r: DataFrame, on: OnSpec, how: str) -> DataFrame:
    la, ra = l.alias("__jl"), r.alias("__jr")
    cond = _build_cond(on, l.columns, r.columns)
    joined = la.join(ra, cond, how)
    if how in ("left_semi", "left_anti"):
        return joined.select(*[F.col(f"__jl.{c}").alias(c) for c in l.columns])
    smap = _suffix_map(l.columns, r.columns)
    return joined.select(
        *[F.col(f"__jl.{c}").alias(c) for c in l.columns],
        *[F.col(f"__jr.{c}").alias(smap[c]) for c in r.columns],
    )


def inner_join(l: DataFrame, r: DataFrame, on: OnSpec) -> DataFrame:
    """runInnerJoinO / iJ (Core.hs:2694-2715)."""
    return _join(l, r, on, "inner")


def left_join(l: DataFrame, r: DataFrame, on: OnSpec) -> DataFrame:
    """runLeftJoin / lJ (Core.hs:2813-2859)."""
    return _join(l, r, on, "left")


def right_join(l: DataFrame, r: DataFrame, on: OnSpec) -> DataFrame:
    """runRightJoin / rJ (Core.hs:2905-2942)."""
    return _join(l, r, on, "right")


def full_outer_join(l: DataFrame, r: DataFrame, on: OnSpec) -> DataFrame:
    """runFullOuterJoin / foJ (Core.hs:2971-2995)."""
    return _join(l, r, on, "full_outer")


def semi_join(l: DataFrame, r: DataFrame, on: OnSpec) -> DataFrame:
    """runSemiJoin / sJ (Core.hs:2639-2660) — left rows with ≥1 match."""
    return _join(l, r, on, "left_semi")


def anti_join(l: DataFrame, r: DataFrame, on: OnSpec) -> DataFrame:
    """runAntiJoin / aJ (Core.hs:2607-2617) — the MERGE insert leg."""
    return _join(l, r, on, "left_anti")


# --------------------------------------------------------------------
# set operations  (reference §2.6; Null-aware equality is Spark-native)
# --------------------------------------------------------------------

def union(l: DataFrame, r: DataFrame) -> DataFrame:
    """runUnion / u (Core.hs:3018-3048) — SQL UNION (dedup)."""
    return l.unionByName(r).distinct()


def union_all(l: DataFrame, r: DataFrame) -> DataFrame:
    """runUnionAll (Core.hs:3051-3072)."""
    return l.unionByName(r)


def union_keep_left_dups(l: DataFrame, r: DataFrame) -> DataFrame:
    """Reference-exact runUnion (Core.hs:3004-3005): left-side rows pass
    through with their multiplicity PRESERVED; only right-side rows not
    already present on the left are appended (each once). Differs from
    SQL UNION (``union``), which dedups globally — the reference
    implements Data.List.union (xs ++ [y | y <- nub ys, y ∉ xs]): left
    dups survive, appended right rows are nub-ed and membership-tested
    against the WHOLE left — which is exactly SQL EXCEPT (subtract)."""
    return l.unionByName(r.subtract(l))


def intersect(l: DataFrame, r: DataFrame) -> DataFrame:
    """runIntersect / i (Core.hs:3078-3101)."""
    return l.intersect(r)


def minus(l: DataFrame, r: DataFrame) -> DataFrame:
    """runDiff / d — Oracle MINUS (Core.hs:3132-3159, worked example
    :3161-3203); Null = Null for membership, like SQL EXCEPT."""
    return l.subtract(r)


# --------------------------------------------------------------------
# ordering  (reference §2.5)
# --------------------------------------------------------------------

def order_by(df: DataFrame, specs: Sequence[tuple[str, str]]) -> DataFrame:
    """runOrderBy / rO (Core.hs:3309-3349): NULLS LAST on ASC, NULLS
    FIRST on DESC (explicit — Spark's default is asc_nulls_first)."""
    cols = []
    for name, direction in specs:
        if direction.lower().startswith("d"):
            cols.append(F.col(name).desc_nulls_first())
        else:
            cols.append(F.col(name).asc_nulls_last())
    return df.orderBy(*cols)


# --------------------------------------------------------------------
# aggregation  (reference §2.4: RAggOperation mini-language)
# --------------------------------------------------------------------

@dataclass
class Sum:  # raggSum, Core.hs:2057-2089
    col: str
    as_: str


@dataclass
class Count:  # raggCount, Core.hs:2094-2125 (divergence: all-NULL -> 0)
    col: str
    as_: str


@dataclass
class CountStar:  # raggCountStar, Core.hs:2130-2140
    as_: str


@dataclass
class CountDist:  # raggCountDist, Core.hs:2145-2182
    col: str
    as_: str
    approx: bool = False  # approx_count_distinct for metrics at scale


@dataclass
class Avg:  # raggAvg, Core.hs:2186-2201
    col: str
    as_: str


@dataclass
class Max:  # raggMax, Core.hs:2204-2235
    col: str
    as_: str


@dataclass
class Min:  # raggMin, Core.hs:2239-2269
    col: str
    as_: str


@dataclass
class StrAgg:
    """raggStrAgg (Core.hs:2017-2053) — listagg with delimiter.

    The reference folds in (sorted) input order; distributed
    collect_list order is nondeterministic, so order is pinned
    explicitly: by value (default) or by `order_cols`.
    """
    col: str
    as_: str
    delim: str = ","
    order_cols: Sequence[str] | None = None


@dataclass
class GenAgg:
    """raggGenericAgg (Core.hs:2001-2010) — custom aggregate from an
    arbitrary function, as an Arrow-vectorized GROUPED_AGG pandas UDF
    (pd.Series -> scalar), never per-row Python."""
    col: str
    as_: str
    fn: Callable
    return_type: T.DataType | str = "double"


AggSpec = Sum | Count | CountStar | CountDist | Avg | Max | Min | StrAgg | GenAgg


def _lower_agg(spec: AggSpec) -> Column:
    if isinstance(spec, Sum):
        return F.sum(spec.col).alias(spec.as_)
    if isinstance(spec, Count):
        return F.count(spec.col).alias(spec.as_)
    if isinstance(spec, CountStar):
        return F.count(F.lit(1)).alias(spec.as_)
    if isinstance(spec, CountDist):
        f = F.approx_count_distinct if spec.approx else F.count_distinct
        return f(F.col(spec.col)).alias(spec.as_)
    if isinstance(spec, Avg):
        return F.avg(spec.col).alias(spec.as_)
    if isinstance(spec, Max):
        return F.max(spec.col).alias(spec.as_)
    if isinstance(spec, Min):
        return F.min(spec.col).alias(spec.as_)
    if isinstance(spec, StrAgg):
        if spec.order_cols:
            lst = F.array_sort(
                F.collect_list(
                    F.struct(*[F.col(c) for c in spec.order_cols], F.col(spec.col).alias("__v"))
                )
            )
            return F.concat_ws(spec.delim, F.transform(lst, lambda x: x["__v"])).alias(
                spec.as_
            )
        return F.concat_ws(spec.delim, F.array_sort(F.collect_list(spec.col))).alias(
            spec.as_
        )
    if isinstance(spec, GenAgg):
        udf = F.pandas_udf(spec.fn, spec.return_type, F.PandasUDFType.GROUPED_AGG)
        return udf(F.col(spec.col)).alias(spec.as_)
    raise TypeError(f"unknown agg spec {spec!r}")


def agg(df: DataFrame, specs: Sequence[AggSpec]) -> DataFrame:
    """runAggregation / rAgg (Core.hs:3244-3261); [] -> identity."""
    if not specs:
        return df
    return df.agg(*[_lower_agg(s) for s in specs])


def group_by(
    df: DataFrame, group_cols: Sequence[str], specs: Sequence[AggSpec]
) -> DataFrame:
    """runGroupBy / rG (Core.hs:3428-3493) — hash aggregate with
    map-side partial aggregation instead of the reference's
    sort-and-scan grouping."""
    return df.groupBy(*group_cols).agg(*[_lower_agg(s) for s in specs])


def group_by_rollup(
    df: DataFrame, group_cols: Sequence[str], specs: Sequence[AggSpec],
    *, cube: bool = False, grouping_id_as: str | None = None,
) -> DataFrame:
    """Multi-level grouping — ROLLUP (prefix hierarchies) or CUBE
    (all subsets) in ONE pass. The reference can only express this as
    N separate runGroupBy calls unioned by hand (one scan each,
    Core.hs:3428-3493); Spark's grouping-sets expansion computes every
    level inside a single hash aggregation (map-side expand + one
    shuffle), so the cost at 100 TB is one scan, not |levels| scans.
    ``grouping_id_as`` optionally exposes GROUPING_ID() so callers can
    tell a subtotal row's NULL from a data NULL."""
    grouped = df.cube(*group_cols) if cube else df.rollup(*group_cols)
    aggs = [_lower_agg(s) for s in specs]
    if grouping_id_as:
        aggs.append(F.grouping_id().alias(grouping_id_as))
    return grouped.agg(*aggs)


def pivot_table(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    spec: AggSpec,
) -> DataFrame:
    """Pivot (long -> wide): one output column per ``pivot_values``
    entry, each holding ``spec``'s aggregate over the matching rows —
    the decode/CASE matrix a reference user would hand-build with
    runColMapping + runGroupBy. ``pivot_values`` is REQUIRED (not
    inferred): inference needs an extra distinct scan and an
    unbounded-width schema — both wrong at corpus scale; a pivot's
    value set must be bounded and known."""
    return (
        df.groupBy(*group_cols)
        .pivot(pivot_col, list(pivot_values))
        .agg(_lower_agg(spec))
    )


# --------------------------------------------------------------------
# windowed helpers  (reference §2.9 — fold-built in the reference)
# --------------------------------------------------------------------

def running_total(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str],
    as_: str,
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """The reference's running-total fold (src/Etl/example2.hs:38-83) as
    a window aggregate. Unpartitioned running totals funnel through one
    task — pass partition_cols at scale."""
    w = W.partitionBy(*(partition_cols or [])).orderBy(*order_cols)
    return df.withColumn(
        as_, F.sum(value_col).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )


def surrogate_key(
    df: DataFrame,
    name: str,
    order_cols: Sequence[str],
    init: int = 0,
) -> DataFrame:
    """addSurrogateKeyJ (Julius.hs:1666-1682): init + 0-based position.

    Distributed zipWithIndex — NEVER a global unpartitioned window
    (which funnels every row through one task at scale):
    1. range-partition + sort by ``order_cols`` (distributed sort;
       equal keys land in the same partition),
    2. O(num_partitions) metadata pass collects per-partition row
       counts -> cumulative start offsets (standard zipWithIndex; the
       only driver-side data is one long per partition),
    3. row_number over a window PARTITIONED by the physical partition
       id + broadcast-joined offsets.
    Deterministic under a total ``order_cols`` order; ties keep the
    arbitrary-but-stable within-partition placement (same contract as
    the reference's positional V.indexed after its sort). For
    cluster-scale contiguous ids without the metadata pass prefer an
    epoch-scoped sequence = (epoch << 40) + rn.
    """
    sdf = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__sk_pid", F.spark_partition_id())
    )
    # persist: the offsets pass and the caller's final action must see
    # the SAME partitioning (a re-evaluated sort over non-deterministic
    # upstream input could re-shuffle rows across pids and corrupt the
    # keys); also saves the second full sort. The cache is released by
    # Spark's ContextCleaner once the returned frame becomes
    # unreachable (weak-reference tracking), and LRU-evicts under
    # memory pressure meanwhile — callers at extreme scale can
    # checkpoint instead.
    sdf = sdf.persist()
    counts = sorted(
        (r[0], r[1]) for r in sdf.groupBy("__sk_pid").count().collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            offsets or [(0, 0)], "__sk_pid_o int, __sk_off long"
        )
    )
    w = W.partitionBy("__sk_pid").orderBy(*order_cols)
    return (
        sdf.join(off_df, sdf["__sk_pid"] == off_df["__sk_pid_o"], "left")
        .withColumn(
            name,
            F.row_number().over(w).cast("long")
            + F.coalesce(F.col("__sk_off"), F.lit(0))
            + F.lit(init - 1),
        )
        .drop("__sk_pid", "__sk_pid_o", "__sk_off")
    )


# --------------------------------------------------------------------
# grouping without aggregation  (reference §2.4: groupNoAgg family)
# --------------------------------------------------------------------

def group_no_agg(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """groupNoAgg (Core.hs:3413-3425): same rows, physically clustered
    into their groups — the reference sorts then re-concatenates the
    group sub-tables; the Spark analog is CLUSTER BY (hash-repartition
    on the grouping key + sort within partitions), which keeps each
    group whole inside one partition without a global sort. Exactly one
    shuffle; no aggregation.

    Divergence note: the reference concatenates with its union (which
    can drop duplicate rows across group boundaries, Core.hs:3407-3408
    via `u`); here ALL rows are retained — grouping is a layout, not a
    set operation."""
    if not cols:
        return df
    return df.repartition(*[F.col(c) for c in cols]).sortWithinPartitions(*cols)


def group_no_agg_list(df: DataFrame, cols: Sequence[str]) -> list[DataFrame]:
    """groupNoAggList (Core.hs:3371-3404): one DataFrame per group.

    Enumerates the distinct grouping keys driver-side — O(#groups)
    metadata, matching the reference's list-of-tables contract; fine
    for few groups (its use case: per-group exports/prints). For MANY
    groups use ``group_map`` (one distributed pass) instead of
    materializing a frame per group. Empty input -> [empty frame]
    (reference returns [emptyRTable])."""
    keys = df.select(*cols).distinct().collect()
    if not keys:
        return [df]
    out = []
    for k in keys:
        pred = None
        for c in cols:
            eq = F.col(c).eqNullSafe(F.lit(k[c]))
            pred = eq if pred is None else pred & eq
        out.append(df.where(pred))
    return out


def group_map(
    df: DataFrame,
    cols: Sequence[str],
    fn: Callable,
    schema: T.StructType | str,
) -> DataFrame:
    """The scalable groupNoAggList consumer: apply ``fn(pandas.DataFrame)
    -> pandas.DataFrame`` to every group in ONE distributed pass
    (grouped-map ``applyInPandas``, Arrow-batched). This is what the
    reference's per-group sub-table list is *for* — without
    materializing #groups driver-side frames."""
    return df.groupBy(*cols).applyInPandas(fn, schema=schema)


def concat_rtab(*dfs: DataFrame) -> DataFrame:
    """concatRTab (Core.hs:3407-3408) — union a list of tables.

    The reference folds its dedup union `u`; SQL UNION semantics here
    too (global dedup), matching runUnion. Use union_all/reduce for
    bag semantics."""
    from functools import reduce

    if not dfs:
        raise ValueError("concat_rtab needs at least one table")
    return reduce(lambda a, b: a.unionByName(b), dfs).distinct()


# --------------------------------------------------------------------
# row/value-level maps  (reference §2.2: rtabMap / rtupleMap family)
# --------------------------------------------------------------------

def rtuple_map(df: DataFrame, fn: Callable[[Column], Column]) -> DataFrame:
    """rtupleMap (Core.hs:2447-2448) lifted table-wide: apply a
    value-level transform to EVERY column (HM.map over each tuple).
    Native Column expressions — one projection, no Python."""
    return df.select(*[fn(F.col(c)).alias(c) for c in df.columns])


def rtuple_map_with_key(
    df: DataFrame, fn: Callable[[str, Column], Column]
) -> DataFrame:
    """rtupleMapWithKey (Core.hs:2451-2452) lifted table-wide: the
    transform also sees the column name (HM.mapWithKey)."""
    return df.select(*[fn(c, F.col(c)).alias(c) for c in df.columns])


# --------------------------------------------------------------------
# DML  (reference §2.7)
# --------------------------------------------------------------------

def insert_append(df: DataFrame, row: dict) -> DataFrame:
    """insertAppendRTab (Core.hs:3520-3526): append one tuple. Missing
    columns become NULL; unknown columns raise (schema is declared).
    Storage is orderless, so append==prepend (SURVEY §2.7)."""
    unknown = set(row) - set(df.columns)
    if unknown:
        raise ValueError(f"columns not in schema: {sorted(unknown)}")
    vals = [
        F.lit(row.get(f.name)).cast(f.dataType).alias(f.name)
        for f in df.schema.fields
    ]
    one = df.sparkSession.range(1).select(*vals)
    return df.unionByName(one)

def delete_rows(df: DataFrame, where: Column) -> DataFrame:
    """deleteRTab (Core.hs:3804-3808): remove rows matching `where`.
    Rows where the predicate is NULL are kept (SQL three-valued logic
    collapsed to False, matching the reference's Eq RDataType)."""
    return df.where(~F.coalesce(where, F.lit(False)))


def update_rows(df: DataFrame, set_map: dict[str, object], where: Column) -> DataFrame:
    """updateRTab (Core.hs:3819-3842): matching rows get new values."""
    out = df
    for c, v in set_map.items():
        val = v if isinstance(v, Column) else F.lit(v)
        out = out.withColumn(c, F.when(F.coalesce(where, F.lit(False)), val).otherwise(F.col(c)))
    return out


def upsert(
    target: DataFrame,
    source: DataFrame,
    match_cols: Sequence[str],
    update_cols: Sequence[str] | None = None,
    matched_filter: Column | None = None,
    check_unique: bool | None = None,
) -> DataFrame:
    """upsertRTab MERGE semantics (Core.hs:3649-3735) as a pure
    DataFrame→DataFrame operator (the lake-backed variant with the
    delete leg and LWW dedup lives in lake.LakeTable.merge).

    Result = S1 ∪ T1 ∪ T2 ∪ T3 (Core.hs:3659-3688):
    - T1 matched target rows passing `matched_filter`: update_cols
      overwritten from source
    - T2 unmatched target rows, T3 matched-but-filtered: untouched
    - S1 unmatched source rows: inserted

    ``check_unique`` mirrors the reference's UniquenessViolation check
    (Core.hs:3700-3708) but COSTS AN EXTRA EAGER PASS over the source
    at operator-construction time — at 10^10-row sources that is a full
    extra scan. Default (None) resolves to True only when
    ``update_cols`` is given (the reference's subset-update style,
    where source multiplicity silently multiplies output rows);
    full-row CDC callers (``update_cols=None``) are expected to have
    LWW-deduplicated upstream (lake merge does) and skip the pass.
    Pass an explicit bool to override either way.
    """
    if check_unique is None:
        check_unique = update_cols is not None
    if check_unique:
        dup = (
            source.groupBy(*match_cols).count().where(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise UniquenessViolationInUpsert(
                f"upsert source not unique on {list(match_cols)}"
            )
    # Side presence via literal markers, NEVER key[0].isNotNull: a
    # TARGET row whose first match column is NULL matches nothing
    # (reference NULL equality, Core.hs:802-824) and must pass through
    # untouched as T2 — keying presence off the join key would classify
    # it as an S1 insert and null its payload (the lake merge pins the
    # same rule with __s_present/__t_present; see CLAUDE.md).
    ta = target.withColumn("__t_present", F.lit(True)).alias("__t")
    sa = source.withColumn("__s_present", F.lit(True)).alias("__s")
    tc = lambda c: F.col(f"__t.{c}")  # noqa: E731
    sc = lambda c: F.col(f"__s.{c}")  # noqa: E731
    cond = None
    for c in match_cols:
        eq = tc(c) == sc(c)
        cond = eq if cond is None else cond & eq
    j = ta.join(sa, cond, "full_outer")
    t_present = tc("__t_present").isNotNull()
    s_present = sc("__s_present").isNotNull()
    may_update = t_present & (
        matched_filter if matched_filter is not None else F.lit(True)
    )
    upd = set(update_cols) if update_cols is not None else {
        c for c in source.columns if c not in match_cols
    }

    def out_col(c: str) -> Column:
        t_val = tc(c) if c in target.columns else F.lit(None)
        s_val = sc(c) if c in source.columns else F.lit(None)
        return (
            F.when(~t_present, s_val)  # S1 insert
            .when(s_present & may_update & F.lit(c in upd), s_val)  # T1
            .otherwise(t_val)  # T2 / T3
            .alias(c)
        )

    keys = [F.coalesce(tc(c), sc(c)).alias(c) for c in match_cols]
    rest = [out_col(c) for c in target.columns if c not in match_cols]
    return j.select(*keys, *rest)
