"""Address-records table (FIXTURES.md F2) — the reference's "index".

Schema mirrors the reference index ``_source`` (IndexFieldMapping
defaults, optimized.py:94-109) plus the fallback fixture corpus at
``ultimate_address_matcher.py:1165-1212``; a deterministic generator
scales it for benchmarks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# The de-facto conformance corpus — field values shaped like the
# reference's 5 fallback docs (U:1165-1212) + records for the five
# canonical parse cases (U:1772-1778).
FIXTURE_RECORDS: list[dict] = [
    {"pid": "test_001", "ADDRESS": "85-101 North 3rd Street Brooklyn, NY 11249",
     "HOUSE": "85-101", "STREET": "North 3rd", "STRTYPE": "St", "PREDIR": "",
     "CITY": "Brooklyn", "STATE": "NY", "ZIP_CODE": "11249", "APTNBR": ""},
    {"pid": "test_002", "ADDRESS": "112 Bedford Avenue Apt 3R Brooklyn, NY 11211",
     "HOUSE": "112", "STREET": "Bedford", "STRTYPE": "Ave", "PREDIR": "",
     "CITY": "Brooklyn", "STATE": "NY", "ZIP_CODE": "11211", "APTNBR": "3R"},
    {"pid": "test_003", "ADDRESS": "55 Berry Street Apt 1H Brooklyn, NY 11211",
     "HOUSE": "55", "STREET": "Berry", "STRTYPE": "St", "PREDIR": "",
     "CITY": "Brooklyn", "STATE": "NY", "ZIP_CODE": "11211", "APTNBR": "1H"},
    {"pid": "test_004", "ADDRESS": "22 North 6 Street Apt 21F Brooklyn, NY 11249",
     "HOUSE": "22", "STREET": "North 6", "STRTYPE": "St", "PREDIR": "",
     "CITY": "Brooklyn", "STATE": "NY", "ZIP_CODE": "11249", "APTNBR": "21F"},
    {"pid": "test_005", "ADDRESS": "60 Broadway Apt 3Q Brooklyn, NY 11249",
     "HOUSE": "60", "STREET": "Broadway", "STRTYPE": "", "PREDIR": "",
     "CITY": "Brooklyn", "STATE": "NY", "ZIP_CODE": "11249", "APTNBR": "3Q"},
]

RECORD_COLUMNS = ("pid", "ADDRESS", "HOUSE", "STREET", "STRTYPE", "PREDIR",
                  "CITY", "STATE", "ZIP_CODE", "APTNBR")


def fixture_records_table() -> pa.Table:
    df = pd.DataFrame(FIXTURE_RECORDS)[list(RECORD_COLUMNS)]
    return pa.Table.from_pandas(df, preserve_index=False)


def synth_records(n: int, seed: int = 42) -> "object":
    """Deterministic records table built from the pages generator's
    entity space (shares streets/cities so queries-vs-records matching
    has real work); one record per entity id."""
    import ray.data as rd

    from address_address_matching_ray.sources.synth import _entity_address
    from address_address_matching_ray.functions.parse import parse_components

    def make(batch) -> pa.Table:
        rows = []
        for i in batch["id"]:
            cid = int(i)
            addr = _entity_address(cid + 1_000, seed)
            c = parse_components(addr)
            rows.append((
                f"pid_{cid:08d}", addr, c.house_number, c.street_name,
                c.street_type.title(), "", c.city, c.state, c.zip_code,
                c.unit))
        cols = list(zip(*rows)) if rows else [[]] * len(RECORD_COLUMNS)
        return pa.table({name: pa.array(list(vals), pa.string())
                         for name, vals in zip(RECORD_COLUMNS, cols)})

    return rd.range(n).map_batches(make, batch_format="numpy", batch_size=2048)
