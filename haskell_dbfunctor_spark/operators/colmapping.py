"""Column Mapping — the reference's ETL transform primitive
(RColMapping, /root/reference/src/Etl/Internal/Core.hs:94-241): derive
target column(s) from source column(s) via an arbitrary transform, with
an optional embedded row filter and remove-sources flag. Four shapes —
1x1, Nx1, 1xN, NxM (createColMapping dispatch, Etl/Internal/Core.hs:108-122);
a same-named target overwrites its source.

Spark lowering (BASELINE.json: vectorized UDFs only, no per-row Python):
- native path: transforms given as Column expressions stay JVM-side in
  whole-stage codegen — always prefer this;
- python path: an arbitrary transform runs as ONE Arrow-vectorized
  pandas UDF (N pd.Series in → pd.DataFrame/pd.Series out); the NxM
  shape returns a struct column that is expanded with select("s.*"),
  so even N→M costs a single vectorized call.
"""

from __future__ import annotations

import uuid
from typing import Callable, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T


def col_mapping(
    df: DataFrame,
    src: Sequence[str],
    tgt: Sequence[str],
    *,
    exprs: Sequence[Column] | None = None,
    fn: Callable | None = None,
    return_types: Sequence[T.DataType | str] | None = None,
    remove_src: bool = False,
    where: Column | None = None,
) -> DataFrame:
    """Apply a column mapping (any of the 4 reference shapes).

    Exactly one of ``exprs`` (native Column expressions, one per target)
    or ``fn`` (vectorized: N pd.Series -> pd.Series [M=1] or
    pd.DataFrame with len(tgt) columns [M>1]; ``return_types`` required)
    must be given. ``where`` is the RColMapping embedded row filter —
    non-matching rows are dropped before the transform
    (Etl/Internal/Core.hs:134-241).
    """
    for c in src:
        if c not in df.columns:
            raise ValueError(f"source column {c!r} does not exist")
    if (exprs is None) == (fn is None):
        raise ValueError("pass exactly one of exprs= or fn=")

    out = df.where(where) if where is not None else df

    if exprs is not None:
        if len(exprs) != len(tgt):
            raise ValueError("need one expression per target column")
        out = out.withColumns(dict(zip(tgt, exprs)))
    else:
        if return_types is None or len(return_types) != len(tgt):
            raise ValueError("fn= requires return_types, one per target")
        rts = [
            t if isinstance(t, T.DataType) else T._parse_datatype_string(t)
            for t in return_types
        ]
        if len(tgt) == 1:
            udf = F.pandas_udf(rts[0])(fn)
            out = out.withColumn(tgt[0], udf(*[F.col(c) for c in src]))
        else:
            struct_t = T.StructType(
                [T.StructField(name, rt, True) for name, rt in zip(tgt, rts)]
            )
            names = list(tgt)

            def _wrapped(*series: pd.Series) -> pd.DataFrame:
                res = fn(*series)
                if isinstance(res, pd.DataFrame):
                    res.columns = names
                    return res
                return pd.DataFrame(dict(zip(names, res)))

            udf = F.pandas_udf(struct_t)(_wrapped)
            tmp = f"__cm_{uuid.uuid4().hex[:8]}"
            out = out.withColumn(tmp, udf(*[F.col(c) for c in src]))
            out = out.withColumns({name: F.col(f"{tmp}.{name}") for name in names})
            out = out.drop(tmp)

    if remove_src:
        # same-named targets already overwrote their source; only drop
        # sources that are not also targets (Etl/Internal/Core.hs:94-99)
        out = out.drop(*[c for c in src if c not in tgt])
    return out
