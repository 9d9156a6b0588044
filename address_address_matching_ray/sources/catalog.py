"""Dataset catalog + small export sinks.

- ``list_tables``       — S8 analog (``list_available_indices``,
  U:1232-1258): the "index list" is a filesystem listing of parquet
  datasets.
- ``export_csv``        — S6 analog (``export_results_to_csv``,
  O:947-994): CSV offered for *small* exports; the real sinks are
  partitioned parquet writes (checkpoint layout, ``Dataset.write_parquet``).
"""

from __future__ import annotations

import os


def list_tables(root: str) -> list[dict]:
    """Parquet datasets under ``root`` with row counts + sizes
    (driver-side metadata only — no data read)."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        if name.endswith(".parquet") and os.path.isfile(path):
            meta = pq.ParquetFile(path).metadata
            out.append({
                "table": name[:-len(".parquet")],
                "rows": meta.num_rows,
                "columns": meta.num_columns,
                "size_bytes": os.path.getsize(path),
            })
        elif os.path.isdir(path):
            files = [f for f in os.listdir(path) if f.endswith(".parquet")]
            if files:
                out.append({"table": name, "rows": -1,
                            "columns": -1, "size_bytes": sum(
                                os.path.getsize(os.path.join(path, f))
                                for f in files)})
    return out


def export_csv(ds, path: str, max_rows: int = 1_000_000) -> str:
    """Write a small Dataset to one CSV file (flattened).  Guarded: a
    big Dataset should go to partitioned parquet, not a driver-side CSV
    (the reference's CSV export is its only sink — O:947-994)."""
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"{n} rows > max_rows={max_rows}: use Dataset.write_parquet for "
            "large outputs; CSV export is for small result sets")
    df = ds.to_pandas()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    df.to_csv(path, index=False)
    return path
