"""Independent oracle for CDC replay: sequential apply in DuckDB.

The final state of applying a keyed I/U/D stream in ``seq`` order is,
per key, the payload of the last event — minus keys whose last event is
a delete. That one-liner is the ground truth the engine's distributed
replay must reproduce exactly (per-turn text equality under stable
(conv_id, turn_idx) ordering — BASELINE.json input_hint).
"""

from __future__ import annotations

import duckdb
import pandas as pd

FINAL_STATE_SQL = """
SELECT conv_id, turn_idx, role, text, {tool} ts
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY seq DESC
  ) AS rn
  FROM feed
  {epoch_filter}
)
WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx
"""


def final_state(
    feed_pdf: pd.DataFrame,
    *,
    with_tool: bool = True,
    max_epoch: int | None = None,
    evolution_epoch: int | None = None,
) -> pd.DataFrame:
    """Sequentially-applied final table state, as pandas.

    ``evolution_epoch`` mirrors the generator contract: events from
    pre-evolution epochs carry no tool value (NULL).
    """
    con = duckdb.connect()
    pdf = feed_pdf.copy()
    if evolution_epoch is not None:
        pdf.loc[pdf["epoch"] < evolution_epoch, "tool"] = None
    con.register("feed", pdf)
    sql = FINAL_STATE_SQL.format(
        tool="tool," if with_tool else "",
        epoch_filter=f"WHERE epoch <= {max_epoch}" if max_epoch is not None else "",
    )
    return con.execute(sql).df()
