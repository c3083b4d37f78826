"""Iceberg-catalog deployment path: the same MERGE semantics as
``LakeTable.merge`` emitted as a single ANSI ``MERGE INTO`` statement.

This sandbox ships no Iceberg runtime jars, so ``lake/table.py``
implements the table format on plain parquet. On a cluster WITH an
Iceberg catalog, everything upstream of the sink (epoching, LWW dedup,
checkpointing, lineage) is unchanged and the sink becomes
``spark.sql(full_merge_statement(...))``: Iceberg's snapshot commit
then supplies the same atomicity/idempotence the manifest rename does
here (pair it with the applied-epochs check for exactly-once, e.g. a
checkpoint table updated in the same transaction or the manifest
sidecar this repo uses).

Reference parity: legs T1/T2/T3/S1 of upsertRTab
(/root/reference/src/RTable/Core.hs:3649-3735) plus the CDC delete leg
and last-writer-wins dedup (replacing the reference's uniqueness
throw, Core.hs:3700-3708).

The LWW dedup subquery is plain ANSI SQL (window row_number), so it is
unit-tested bit-for-bit against both the engine's hash-agg dedup and
DuckDB (tests/test_iceberg_sql.py); the MERGE statement itself is
structurally tested (DuckDB 1.0 cannot parse MERGE).
"""

from __future__ import annotations

from typing import Sequence


def _and_join(parts: Sequence[str]) -> str:
    return " AND ".join(parts)


def dedup_subquery(
    source: str,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    *,
    op_col: str | None = "op",
    order_cols: Sequence[str] = ("ts", "seq"),
) -> str:
    """Last-writer-wins dedup of a change batch as ANSI SQL: one row
    per key, the one with the highest (order_cols) tuple. Mirrors the
    engine's hash-agg max_by (lake/table.py:merge); expressed as a
    row_number window here because MERGE sources must be relations."""
    cols = list(key_cols) + list(payload_cols) + ([op_col] if op_col else [])
    order = ", ".join(f"{c} DESC" for c in order_cols)
    return (
        "SELECT " + ", ".join(cols) + " FROM (\n"
        "  SELECT " + ", ".join(cols) + ",\n"
        "         row_number() OVER (PARTITION BY "
        + ", ".join(key_cols)
        + f" ORDER BY {order}) AS __rn\n"
        f"  FROM {source}\n"
        ") WHERE __rn = 1"
    )


def full_merge_statement(
    target: str,
    source: str,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    *,
    update_cols: Sequence[str] | None = None,
    op_col: str | None = "op",
    delete_op: str = "D",
    order_cols: Sequence[str] = ("ts", "seq"),
    matched_filter_sql: str | None = None,
    dedup: bool = True,
) -> str:
    """The lake MERGE as one Iceberg ``MERGE INTO``.

    Legs (reference Core.hs:3659-3688 + CDC delete):
    - WHEN MATCHED AND op = delete  -> DELETE
    - WHEN MATCHED AND op <> delete [AND matched_filter] -> UPDATE the
      update_cols subset (default: all payload columns)
    - WHEN NOT MATCHED AND op <> delete -> INSERT
    Deletes of absent keys are no-ops by construction (NOT MATCHED
    inserts exclude deletes). ``matched_filter_sql`` references t./s.
    (e.g. ``t.ts <= s.ts`` — the cross-batch LWW guard).
    """
    src = (
        f"(\n{dedup_subquery(source, key_cols, payload_cols, op_col=op_col, order_cols=order_cols)}\n)"
        if dedup
        else source
    )
    on = _and_join([f"t.{c} = s.{c}" for c in key_cols])
    upd = list(update_cols) if update_cols is not None else list(payload_cols)
    set_clause = ", ".join(f"t.{c} = s.{c}" for c in upd)
    ins_cols = list(key_cols) + list(payload_cols)
    insert_clause = (
        "(" + ", ".join(ins_cols) + ") VALUES ("
        + ", ".join(f"s.{c}" for c in ins_cols) + ")"
    )
    not_delete = f"s.{op_col} <> '{delete_op}'" if op_col else "TRUE"
    is_delete = f"s.{op_col} = '{delete_op}'" if op_col else "FALSE"
    upd_cond = not_delete
    if matched_filter_sql:
        upd_cond += f" AND ({matched_filter_sql})"
    lines = [f"MERGE INTO {target} t", f"USING {src} s", f"ON {on}"]
    if op_col:
        lines.append(f"WHEN MATCHED AND {is_delete} THEN DELETE")
    lines.append(f"WHEN MATCHED AND {upd_cond} THEN UPDATE SET {set_clause}")
    lines.append(f"WHEN NOT MATCHED AND {not_delete} THEN INSERT {insert_clause}")
    return "\n".join(lines)


def create_table_ddl(
    table: str,
    columns: Sequence[tuple[str, str]],
    key_cols: Sequence[str],
    num_buckets: int = 64,
) -> str:
    """Iceberg DDL matching the lake layout: hash-bucketed by key (the
    partition transform equivalent of LakeTable's xxhash64 % B)."""
    cols = ",\n  ".join(f"{n} {t}" for n, t in columns)
    bucket_col = key_cols[0]
    return (
        f"CREATE TABLE {table} (\n  {cols}\n)\n"
        f"USING iceberg\n"
        f"PARTITIONED BY (bucket({num_buckets}, {bucket_col}))\n"
        f"TBLPROPERTIES ('write.distribution-mode' = 'hash')"
    )


def add_column_ddl(
    table: str, name: str, dtype: str, default=None
) -> list[str]:
    """Iceberg-catalog statements for ``LakeTable.add_column``: an
    additive ADD COLUMN, plus (Iceberg v3 / Spark 3.4+ default-values)
    a SET DEFAULT when one is given — the catalog-deployment twin of
    the engine's metadata-only evolution. Returned as separate
    statements because Spark's ALTER TABLE grammar takes them that
    way."""
    stmts = [f"ALTER TABLE {table} ADD COLUMN {name} {dtype}"]
    if default is not None:
        lit = f"'{default}'" if isinstance(default, str) else repr(default)
        stmts.append(
            f"ALTER TABLE {table} ALTER COLUMN {name} SET DEFAULT {lit}"
        )
    return stmts
