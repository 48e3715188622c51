"""Regression: the catalog must read events.ts correctly whichever
parquet encoding the fixture generator used.

Round 2 failure mode: the testdata switched from INT64 TIMESTAMP(NANOS)
to TIMESTAMP(MICROS) and the unconditional ns→µs repair (``ts div
1000``) shrank every instant 1000× (1970 timestamps), breaking
q16/q21/q31/q40 hash checks. The catalog now sniffs the footer unit;
this test writes the SAME instants in ns, µs and ms encodings and
asserts all three load to identical microsecond timestamps.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from morphl_community_edition_spark.catalog import load_table

# Three instants incl. a sub-millisecond fraction (exercises floor
# truncation on the ns path: ...789µs stored as ...789123ns).
_INSTANTS_US = [
    1704067200_000000,  # 2024-01-01 00:00:00
    1704067200_123456,  # 2024-01-01 00:00:00.123456
    1706659199_999999,  # 2024-01-30 23:59:59.999999
]


def _write_events(path: str, ts_array: pa.Array) -> None:
    n = len(ts_array)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(['{"k": 1}'] * n, pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize(
    "unit,scale",
    [("ns", 1000), ("us", 1), ("ms", None)],
)
def test_events_ts_unit_sniffing(spark, tmp_path, unit, scale):
    sf_dir = tmp_path / f"sf_{unit}"
    sf_dir.mkdir()
    if unit == "ms":
        # ms can't carry the sub-ms instant; truncate expectations too
        vals = [v // 1000 for v in _INSTANTS_US]
        arr = pa.array(vals, pa.timestamp("ms"))
        expected_us = [v * 1000 for v in vals]
    else:
        vals = [v * scale for v in _INSTANTS_US]
        arr = pa.array(vals, pa.timestamp(unit))
        expected_us = _INSTANTS_US
    _write_events(str(sf_dir / "events.parquet"), arr)

    df = load_table(spark, str(sf_dir), "events")
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    epoch = dt.datetime(1970, 1, 1)
    got_us = [int((t - epoch).total_seconds() * 1e6 + 0.5) for t in got]
    assert got_us == expected_us
    assert [f.dataType.simpleString() for f in df.schema.fields if f.name == "ts"] == [
        "timestamp"
    ]


def test_events_ts_bare_int64_treated_as_nanos(spark, tmp_path):
    sf_dir = tmp_path / "sf_int64"
    sf_dir.mkdir()
    arr = pa.array([v * 1000 for v in _INSTANTS_US], pa.int64())
    _write_events(str(sf_dir / "events.parquet"), arr)
    df = load_table(spark, str(sf_dir), "events")
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    epoch = dt.datetime(1970, 1, 1)
    got_us = [int((t - epoch).total_seconds() * 1e6 + 0.5) for t in got]
    assert got_us == _INSTANTS_US
