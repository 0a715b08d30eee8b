

def test_events_nanos_parquet_loads_identically(spark, sf_dir, tmp_path):
    """The loader's footer sniff must handle BOTH precisions the testdata
    generator has emitted: timestamp[us] reads directly, TIMESTAMP(NANOS)
    goes through the ns->us long shim.  Rewrite the events table as
    nanos and assert the loaded values are identical."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rippled_historical_database_spark.sources.catalog import (
        events_read_schema,
        load_table,
    )

    src = os.path.join(sf_dir, "events.parquet")
    t = pq.read_table(src)
    ts_idx = t.schema.get_field_index("ts")
    ns_type = pa.timestamp("ns")
    t_ns = t.set_column(ts_idx, "ts", t.column("ts").cast(ns_type))
    ns_dir = str(tmp_path / "events_ns")
    os.makedirs(ns_dir)
    ns_path = os.path.join(ns_dir, "events.parquet")
    # version>=2.6 keeps nanos in the footer instead of coercing to us
    pq.write_table(t_ns, ns_path, version="2.6", coerce_timestamps=None)
    assert pq.ParquetFile(ns_path).metadata.schema.column(ts_idx).logical_type.__str__().lower().count("nano")

    _, shim = events_read_schema(ns_path)
    assert shim, "nanos footer must trigger the long shim"
    _, no_shim = events_read_schema(src)
    assert not no_shim, "micros footer must read directly"

    baseline = load_table(spark, sf_dir, "events").orderBy("event_id").collect()
    ns_loaded = load_table(spark, ns_dir, "events").orderBy("event_id").collect()
    assert ns_loaded == baseline


def test_failed_footer_sniff_warns_instead_of_silent_default(tmp_path):
    """A corrupt/unreadable footer must emit a visible warning (not be
    swallowed): silently assuming micros would read a genuine
    TIMESTAMP(NANOS) column 1000x wrong with no diagnostic."""
    import warnings

    from rippled_historical_database_spark.sources.catalog import _ts_is_nanos

    bad = tmp_path / "events.parquet"
    bad.write_bytes(b"not a parquet file at all")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert _ts_is_nanos(str(bad)) is False
    assert any("timestamp precision" in str(w.message) for w in caught)

    # A missing file stays quiet -- the subsequent read errors clearly.
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert _ts_is_nanos(str(tmp_path / "absent.parquet")) is False
    assert not caught
