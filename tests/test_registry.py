"""Registry hygiene: the driver-facing contract of __spark_entry__."""


def test_sample_first_names_all_exist():
    from lindel_spark import queries as Q
    missing = [n for n in Q._SAMPLE_FIRST if n not in Q._REGISTRY]
    assert missing == [], f"_SAMPLE_FIRST names not registered: {missing}"


def test_sample_first_has_no_duplicates():
    from lindel_spark import queries as Q
    seen, dups = set(), []
    for n in Q._SAMPLE_FIRST:
        if n in seen:
            dups.append(n)
        seen.add(n)
    assert dups == []


def test_every_query_has_oracle_and_text_is_parseable():
    import duckdb

    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(qs) == set(os_), "every query needs an oracle"
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'")
    for name, sql in os_.items():
        # EXPLAIN parses + binds the oracle without executing it —
        # catches column typos and dialect slips in seconds
        con.execute(f"EXPLAIN {sql}")
