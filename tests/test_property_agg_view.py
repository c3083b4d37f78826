"""Property-based check (hypothesis): for arbitrary keyed U/D batch
sequences — group migrations, extreme deletions, NULL groups, NULL
values, re-inserts — the INCREMENTALLY maintained aggregate view
(lake/agg_view.py: algebraic sum/count folds + min/max dirty-group
repair off the net CDF window) equals a from-scratch GROUP BY over
the final state after every sync cadence.
"""

import pandas as pd
import pyspark.sql.types as T
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from haskell_dbfunctor_spark.lake.agg_view import (
    Max,
    Min,
    Sum,
    create_agg_view,
    sync_agg_view,
)
from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.IntegerType(), False),
    T.StructField("g", T.StringType(), True),
    T.StructField("v", T.LongType(), True),
])

SPECS = [Sum("v", "v_sum"), Min("v", "v_min"), Max("v", "v_max")]

# few keys + few groups + a narrow value range force collisions:
# group migrations, deletes of the stored extreme, all-NULL groups
event = st.tuples(
    st.integers(0, 6),                                  # key
    st.sampled_from(["U", "D"]),                        # op
    st.sampled_from(["x", "y", None]),                  # group (NULL legal)
    st.one_of(st.none(), st.integers(-3, 3)),           # value (NULL legal)
)


def oracle(batches):
    """Sequential ground truth: per-key last-write state (batches apply
    in order; within a batch the LAST event per key wins — seq order),
    then a plain GROUP BY over the survivors."""
    state = {}
    for batch in batches:
        for k, op, g, v in batch:
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = (g, v)
    groups: dict = {}
    for g, v in state.values():
        n, vals = groups.get(g, (0, []))
        groups[g] = (n + 1, vals + ([v] if v is not None else []))
    out = {}
    for g, (n, vals) in groups.items():
        out[g] = (
            n,
            sum(vals) if vals else None,
            len(vals),
            min(vals) if vals else None,
            max(vals) if vals else None,
        )
    return out


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.lists(event, min_size=1, max_size=12),
             min_size=1, max_size=4),
    st.integers(1, 3),  # sync cadence: every batch / every 2nd / every 3rd
)
def test_view_matches_recompute(spark, tmp_path_factory, batches, cadence):
    root = str(tmp_path_factory.mktemp("av"))
    table = LakeTable.create(
        spark, f"{root}/t", SCHEMA, key_cols=["k"], num_buckets=4,
    )
    view = create_agg_view(spark, f"{root}/v", table, ["g"], SPECS,
                           num_buckets=2)
    for i, batch in enumerate(batches):
        pdf = pd.DataFrame(
            [{"k": k, "op": op, "g": g, "v": v, "seq": j}
             for j, (k, op, g, v) in enumerate(batch)]
        )
        table.merge(
            spark.createDataFrame(
                pdf, "k int, op string, g string, v long, seq long"
            ),
            epoch_id=f"e{i}", order_cols=("seq",), drop_cols=("seq",),
        )
        if (i + 1) % cadence == 0:
            sync_agg_view(table, view, ["g"], SPECS)
    sync_agg_view(table, view, ["g"], SPECS)  # final catch-up

    got = {
        r["g"]: (r["n_rows"], r["v_sum"], r["v_sum_n"], r["v_min"],
                 r["v_max"])
        for r in view.read().collect()
    }
    assert got == oracle(batches)


# ---- float contract (VERDICT r03 item 2) -------------------------------
# DOUBLE measures with adversarial magnitudes (the 1e16 + 1 - 1e16
# cancellation class): with float_sum_repair=True (default) a retraction
# on a float Sum triggers exact group repair, so the stored sum never
# drifts — the view must match math.fsum ground truth to fp tolerance.
# Values are all POSITIVE so insert-only folds never cancel (their
# reassociation error is ~ulp relative to the total, inherent to any
# float summation incl. Spark's own); only retractions cancel, and
# those route through the repair path.

FSCHEMA = T.StructType([
    T.StructField("k", T.IntegerType(), False),
    T.StructField("g", T.StringType(), True),
    T.StructField("v", T.DoubleType(), True),
])

FSPECS = [Sum("v", "v_sum")]

fevent = st.tuples(
    st.integers(0, 6),
    st.sampled_from(["U", "D"]),
    st.sampled_from(["x", "y"]),
    st.one_of(st.none(), st.sampled_from([1.0, 3.0, 1e16])),
)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.lists(fevent, min_size=1, max_size=10),
             min_size=1, max_size=4),
    st.integers(1, 2),
)
def test_float_sum_no_drift(spark, tmp_path_factory, batches, cadence):
    import math

    root = str(tmp_path_factory.mktemp("avf"))
    table = LakeTable.create(
        spark, f"{root}/t", FSCHEMA, key_cols=["k"], num_buckets=4,
    )
    view = create_agg_view(spark, f"{root}/v", table, ["g"], FSPECS,
                           num_buckets=2)
    for i, batch in enumerate(batches):
        pdf = pd.DataFrame(
            [{"k": k, "op": op, "g": g, "v": v, "seq": j}
             for j, (k, op, g, v) in enumerate(batch)]
        )
        table.merge(
            spark.createDataFrame(
                pdf, "k int, op string, g string, v double, seq long"
            ),
            epoch_id=f"e{i}", order_cols=("seq",), drop_cols=("seq",),
        )
        if (i + 1) % cadence == 0:
            sync_agg_view(table, view, ["g"], FSPECS)
    sync_agg_view(table, view, ["g"], FSPECS)

    state = {}
    for batch in batches:
        for k, op, g, v in batch:
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = (g, v)
    want: dict = {}
    for g, v in state.values():
        n, vals = want.get(g, (0, []))
        want[g] = (n + 1, vals + ([v] if v is not None else []))
    got = {
        r["g"]: (r["n_rows"], r["v_sum"], r["v_sum_n"])
        for r in view.read().collect()
    }
    assert set(got) == set(want)
    for g, (n, vals) in want.items():
        gn, gsum, gsn = got[g]
        assert gn == n and gsn == len(vals)
        if not vals:
            assert gsum is None
        else:
            ref = math.fsum(vals)
            # exact-repair contract: no cancellation drift; remaining
            # error is ulp-level reassociation on insert-only folds
            assert math.isclose(gsum, ref, rel_tol=1e-9, abs_tol=1e-9), (
                g, gsum, ref)
