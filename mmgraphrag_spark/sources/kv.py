"""Reference-format JSON KV store import/export (S4; storage.py:179-230).

The reference persists each namespace as ``kv_store_<ns>.json`` holding ONE
object ``{id: {field: value, ...}}``. These helpers let a reference user carry
their existing working_dir into the Spark engine (import) and write results
back in a shape the reference tooling can read (export). Driver-side JSON
parse — KV stores are per-document-scale artifacts, not the 100 TB path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def read_kv_json(spark: SparkSession, path: str, id_col: str = "id") -> DataFrame:
    """kv_store_<ns>.json -> DataFrame with the id as a column; field set is
    the union across records (reference records are closed-set in practice,
    SURVEY §1.2)."""
    with open(path) as f:
        store = json.load(f)
    fields: list[str] = []
    for rec in store.values():
        for k in rec:
            if k not in fields:
                fields.append(k)
    rows = [
        tuple([key] + [json.dumps(rec[k]) if isinstance(rec.get(k), (dict, list))
                       else rec.get(k) for k in fields])
        for key, rec in store.items()
    ]
    return spark.createDataFrame(rows, [id_col] + fields)


def write_kv_json(df: DataFrame, path: str, id_col: str = "id",
                  max_rows: int = 5_000_000) -> None:
    """DataFrame -> reference kv_store JSON object (driver-side collect with
    a row cap)."""
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(f"KV export capped at {max_rows} rows; use parquet")
    cols = [c for c in df.columns if c != id_col]
    out = {}
    for r in df.collect():
        out[r[id_col]] = {c: r[c] for c in cols}
    with open(path, "w") as f:
        json.dump(out, f, ensure_ascii=False, indent=2, default=list)
