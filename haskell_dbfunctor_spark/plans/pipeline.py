"""Pipeline — the Julius ETL-chain model over DataFrames.

The reference's Julius EDSL (EtlMapStart :-> op :-> op :=> NamedResult,
/root/reference/src/Etl/Julius.hs:559-564) lowers a left-deep op chain
into composed closures executed verbatim (Julius.hs:1052-1113,
:1238-1609). Here the chain IS the Catalyst logical plan: each step is
a lazy DataFrame transformation; Catalyst reorders/pushes/prunes, which
the reference never does (SURVEY.md §4.1).

- ``named(name)`` ≈ ``:=> NamedResult`` (Julius.hs:1039-1048) — marks a
  reusable intermediate; unlike the reference (which recomputes named
  results on reuse, test/DBFTests.hs:312-337) a named result is cached
  when reused, because recomputation at 100 TB is a bug, not a feature.
- ``counted(name)`` ≈ RTabResult (Core.hs:2457-2488) — a per-step
  row-count metric via ``observe`` (piggybacks the next action, no
  extra pass).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Observation, functions as F

from ..operators import core as ops


class Pipeline:
    def __init__(self, df: DataFrame):
        self.df = df
        self.named_results: dict[str, DataFrame] = {}
        self.observations: dict[str, Observation] = {}

    # -- composition -----------------------------------------------
    def _next(self, df: DataFrame) -> "Pipeline":
        p = Pipeline(df)
        p.named_results = self.named_results
        p.observations = self.observations
        return p

    def filter(self, pred: Column) -> "Pipeline":
        return self._next(ops.rfilter(self.df, pred))

    def select(self, *cols: str) -> "Pipeline":
        return self._next(ops.project(self.df, cols))

    def select_missed_hits(self, *cols: str) -> "Pipeline":
        return self._next(ops.project_missed_hits(self.df, cols))

    def limit(self, n: int) -> "Pipeline":
        return self._next(ops.limit(self.df, n))

    def join(self, other: DataFrame, on, how: str = "inner") -> "Pipeline":
        f = {
            "inner": ops.inner_join,
            "left": ops.left_join,
            "right": ops.right_join,
            "full": ops.full_outer_join,
            "semi": ops.semi_join,
            "anti": ops.anti_join,
        }[how]
        return self._next(f(self.df, other, on))

    def union(self, other: DataFrame) -> "Pipeline":
        return self._next(ops.union(self.df, other))

    def union_all(self, other: DataFrame) -> "Pipeline":
        return self._next(ops.union_all(self.df, other))

    def intersect(self, other: DataFrame) -> "Pipeline":
        return self._next(ops.intersect(self.df, other))

    def minus(self, other: DataFrame) -> "Pipeline":
        return self._next(ops.minus(self.df, other))

    def group_by(self, cols: Sequence[str], specs) -> "Pipeline":
        return self._next(ops.group_by(self.df, cols, specs))

    def agg(self, specs) -> "Pipeline":
        return self._next(ops.agg(self.df, specs))

    def order_by(self, *specs: tuple[str, str]) -> "Pipeline":
        return self._next(ops.order_by(self.df, specs))

    def col_mapping(self, *args, **kwargs) -> "Pipeline":
        from ..operators.colmapping import col_mapping

        return self._next(col_mapping(self.df, *args, **kwargs))

    def apply(self, fn: Callable[[DataFrame], DataFrame]) -> "Pipeline":
        """GenUnaryOp (Core.hs:1946; Julius.hs:1496-1508) — arbitrary
        table-level operation composed into the chain."""
        return self._next(fn(self.df))

    def apply2(
        self,
        other: "DataFrame | Pipeline | str",
        fn: Callable[[DataFrame, DataFrame], DataFrame],
    ) -> "Pipeline":
        """GenBinaryOp / BinaryRTableOperation (Core.hs:1949; Julius
        eval src/Etl/Julius.hs:1511-1523) — arbitrary two-table
        operation composed into the chain. ``other`` may be a
        DataFrame, another Pipeline (its current frame), or the name of
        a previously ``named()`` result in this chain (the Julius
        TabL/Previous operand forms)."""
        if isinstance(other, Pipeline):
            rhs = other.df
        elif isinstance(other, str):
            rhs = self.named_results[other]
        else:
            rhs = other
        return self._next(fn(self.df, rhs))

    # -- named results / metrics ------------------------------------
    def named(self, name: str, cache: bool = True) -> "Pipeline":
        df = self.df.cache() if cache else self.df
        p = self._next(df)
        p.named_results[name] = df
        return p

    def counted(self, name: str) -> "Pipeline":
        obs = Observation(name)
        p = self._next(self.df.observe(obs, F.count(F.lit(1)).alias("rows")))
        p.observations[name] = obs
        return p

    def result(self, name: str) -> DataFrame:
        """takeNamedResult analog (Julius.hs:1039-1048)."""
        return self.named_results[name]

    def counts(self) -> dict[str, int]:
        out = {}
        for name, obs in self.observations.items():
            try:
                out[name] = obs.get.get("rows")
            except Exception:
                out[name] = None
        return out

    def to_df(self) -> DataFrame:
        return self.df

    def run_either(
        self, action: Callable[[DataFrame], object] | None = None
    ) -> tuple[object | None, Exception | None]:
        """eitherRunJulius / eitherRunETL (Julius.hs:1194-1222) — run
        the chain and capture the failure as a VALUE instead of an
        exception: returns ``(result, None)`` on success or
        ``(None, error)`` on failure, the Either convention for callers
        composing many chains who want to collect failures rather than
        unwind. ``action`` forces the lazy plan; the default is a
        driver-safe noop-format write (rows never leave the executors —
        returns ``True`` on success). Pass ``lambda df: df.collect()``
        to get rows back (small results only) or ``lambda df:
        df.count()`` for a row count. Python callers who prefer
        exceptions just use the chain directly — this wrapper exists
        for reference-surface parity."""

        def _noop_materialize(df: DataFrame) -> bool:
            df.write.format("noop").mode("overwrite").save()
            return True

        try:
            out = (action or _noop_materialize)(self.df)
            return out, None
        except Exception as e:  # noqa: BLE001 — Either captures any failure
            return None, e
