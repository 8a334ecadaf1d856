"""SQL DML surface (r13, VERDICT r12 #2): INSERT INTO / UPDATE /
DELETE FROM / MERGE INTO as SQL text routed to the existing TxTable
mutation ops — parse → dispatch, no new mutation code.  The grammar
mirrors the reference's generated-statement idiom
(big_uery_handler.py:158-165 INSERT…SELECT SAFE_CAST;
:188-192 UPDATE…WHERE IS NULL) plus Delta's MERGE INTO spelling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_fresh_picked_leads_spark.sources.sqldml import execute_dml
from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable


def _df(spark, lo, hi, pri="P"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10.0).alias("price"),
        F.lit(pri).alias("pri"),
    )


def _mk(spark, tmp_path, name="t", lo=0, hi=10):
    return TxTable.create(spark, str(tmp_path / name), _df(spark, lo, hi))


def test_insert_select_positional(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _df(spark, 100, 105, pri="NEW").createOrReplaceTempView("dml_staging")
    res = execute_dml(
        spark,
        "INSERT INTO t SELECT k, price, pri FROM dml_staging",
        {"t": t},
    )
    assert res["op"] == "insert" and res["rows"] == 5
    assert t.read().count() == 15
    assert t.read().filter(F.col("pri") == "NEW").count() == 5


def test_insert_column_list_null_fills(spark, tmp_path):
    t = _mk(spark, tmp_path)
    res = execute_dml(
        spark,
        "INSERT INTO t (k, price) SELECT id, CAST(id AS DOUBLE) "
        "FROM range(200, 203)",
        {"t": t},
    )
    assert res["rows"] == 3
    got = t.read().filter(F.col("k") >= 200)
    assert got.count() == 3
    assert got.filter(F.col("pri").isNull()).count() == 3


def test_insert_values_and_try_cast(spark, tmp_path):
    # the reference's INSERT…SELECT SAFE_CAST idiom: try_cast inside
    # the query text resolves Spark-side, corrupt values land NULL
    t = _mk(spark, tmp_path)
    execute_dml(
        spark,
        "INSERT INTO t SELECT try_cast(v AS BIGINT), p, 'V' FROM "
        "VALUES ('300', 1.0), ('x301', 2.0) AS src(v, p)",
        {"t": t},
    )
    vals = {r.k for r in t.read().filter(F.col("pri") == "V").collect()}
    assert vals == {300, None}


def test_update_where_and_unconditional(spark, tmp_path):
    t = _mk(spark, tmp_path)
    res = execute_dml(
        spark,
        "UPDATE t SET pri = 'STAMPED', price = price + 1 "
        "WHERE k % 2 = 0",
        {"t": t},
    )
    assert res["op"] == "update" and res["rows"] == 5
    assert t.read().filter(F.col("pri") == "STAMPED").count() == 5
    # string literal containing a comma must not split the SET list
    execute_dml(spark, "UPDATE t SET pri = 'a,b'", {"t": t})
    assert t.read().filter(F.col("pri") == "a,b").count() == 10


def test_delete_where(spark, tmp_path):
    t = _mk(spark, tmp_path)
    res = execute_dml(spark, "DELETE FROM t WHERE k >= 7", {"t": t})
    assert res["rows"] == 3
    assert t.read().count() == 7


def test_merge_full_clause_matrix(spark, tmp_path):
    t = _mk(spark, tmp_path)  # keys 0..9
    _df(spark, 5, 15, pri="S").createOrReplaceTempView("dml_src")
    res = execute_dml(
        spark,
        """
        MERGE INTO t AS t USING dml_src AS s
        ON t.k = s.k
        WHEN MATCHED AND s.k % 2 = 0 THEN
          UPDATE SET pri = s.pri, price = s.price + 100
        WHEN MATCHED AND t.k % 3 = 0 THEN DELETE
        WHEN NOT MATCHED AND s.k % 5 <> 0 THEN INSERT *
        """,
        {"t": t},
    )
    # matched keys 5..9: update claims 6,8; delete claims 9 (k%3=0,
    # not claimed by update); inserts 11,12,13,14 (10 % 5 = 0 skipped)
    assert res["updated"] == 2 and res["deleted"] == 1
    assert res["inserted"] == 4
    rows = {r.k: r for r in t.read().collect()}
    assert 9 not in rows and 10 not in rows
    assert rows[6].pri == "S" and rows[6].price == 160.0
    assert rows[5].pri == "P"  # matched, no clause fired
    assert rows[11].pri == "S"


def test_merge_subquery_source_and_update_star(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _df(spark, 0, 3, pri="Z").createOrReplaceTempView("dml_src2")
    res = execute_dml(
        spark,
        "MERGE INTO t t USING (SELECT k, price * 2 AS price, pri "
        "FROM dml_src2) s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET *",
        {"t": t},
    )
    assert res["updated"] == 3 and res["inserted"] == 0
    assert t.read().filter(F.col("pri") == "Z").count() == 3


def test_unsupported_shapes_raise(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for bad in [
        "TRUNCATE TABLE t",
        "UPDATE t WHERE k = 1",  # no SET
        "MERGE INTO t x USING t y ON x.k = y.k "
        "WHEN MATCHED THEN DELETE",  # aliases must be t/s
        "MERGE INTO t t USING t s ON t.k < s.k "
        "WHEN MATCHED THEN DELETE",  # non-equi ON
        "MERGE INTO t t USING t s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)",
        "INSERT INTO nope SELECT 1",
    ]:
        with pytest.raises(ValueError):
            execute_dml(spark, bad, {"t": t})


def test_dml_routes_to_engine_semantics(spark, tmp_path):
    # the dispatcher reuses engine ops: CHECK constraints still gate
    # SQL-spelled mutations, proving there is no parallel write path
    t = _mk(spark, tmp_path)
    t.add_constraint("price_pos", "price >= 0")
    with pytest.raises(Exception):
        execute_dml(
            spark, "UPDATE t SET price = -1 WHERE k = 1", {"t": t}
        )
    assert t.read().filter(F.col("price") < 0).count() == 0


def test_maintenance_statements(spark, tmp_path):
    """OPTIMIZE / VACUUM / RESTORE as SQL text (Delta's maintenance
    spelling), routed to compact/vacuum/restore."""
    import os

    t = TxTable.create(
        spark,
        str(tmp_path / "m"),
        spark.range(0, 50).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).alias("p"),
            (F.col("id") * 1.0).alias("price"),
        ),
        partition_by=["p"],
        stats_cols=["k"],
    )
    tables = {"m": t}
    t.append(t.read().withColumn("k", F.col("k") + 100))
    v_before = t.snapshot().version
    res = execute_dml(
        spark, "OPTIMIZE m WHERE p = 1 ZORDER BY (k, price)", tables
    )
    assert res["op"] == "optimize" and res["version"] > v_before
    p1 = [f for f in t.snapshot().files if "__txp_p=1" in f]
    assert p1, "scoped OPTIMIZE kept the partition"
    assert len([f for f in t.snapshot().files if "__txp_p=0" in f]) > 1, (
        "out-of-scope partition must not be compacted"
    )
    # SQL VACUUM keeps the engine's safety window (min_age 1h), so a
    # freshly-stranded file is NOT removed — assert dispatch + safety,
    # then confirm the engine-level unsafe form still sees the strands
    head = set(t.snapshot().files)
    res = execute_dml(spark, "VACUUM m RETAIN 0 HOURS", tables)
    assert res["op"] == "vacuum" and res["removed"] == 0
    assert all(os.path.exists(f) for f in head)
    v = t.snapshot().version
    res = execute_dml(spark, "RESTORE TABLE m TO VERSION AS OF %d" % v, tables)
    assert res["op"] == "restore"  # restore-to-head is a no-op
    assert t.read().count() == 100
    with pytest.raises(ValueError, match="OPTIMIZE WHERE"):
        execute_dml(spark, "OPTIMIZE m WHERE p > 1", tables)


def test_comments_are_quote_aware(spark, tmp_path):
    t = _mk(spark, tmp_path)
    execute_dml(
        spark,
        "UPDATE t SET pri = 'a--b' -- stamp the odd rows\n"
        "WHERE k % 2 = 1;",
        {"t": t},
    )
    assert t.read().filter(F.col("pri") == "a--b").count() == 5


def test_insert_overwrite_and_identity_targets(spark, tmp_path):
    t = _mk(spark, tmp_path)
    res = execute_dml(
        spark,
        "INSERT OVERWRITE TABLE t SELECT id, id * 1.0, 'OW' "
        "FROM range(0, 4)",
        {"t": t},
    )
    assert res["op"] == "insert_overwrite" and res["rows"] == 4
    assert t.read().count() == 4
    # identity target: SQL INSERT omits the GENERATED ALWAYS column —
    # positional mapping skips it and the engine assigns ids
    ti = TxTable.create(
        spark,
        str(tmp_path / "i"),
        spark.range(3).select(F.col("id").alias("k")),
        identity="row_id",
    )
    res = execute_dml(
        spark, "INSERT INTO i SELECT id + 10 FROM range(0, 2)", {"i": ti}
    )
    assert res["rows"] == 2
    got = {r.k: r.row_id for r in ti.read().collect()}
    assert set(got) == {0, 1, 2, 10, 11}
    assert sorted(got.values()) == [1, 2, 3, 4, 5]
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        execute_dml(
            spark,
            "INSERT INTO i (k, row_id) SELECT id, id FROM range(2)",
            {"i": ti},
        )


def test_create_table_as_and_alter(spark, tmp_path):
    """CTAS + ALTER TABLE: the full table lifecycle is SQL-drivable —
    create partitioned, evolve the schema through the column-mapping
    ops, gate with a CHECK constraint, all dispatched to engine ops."""
    tables = {}
    res = execute_dml(
        spark,
        "CREATE TABLE leads LOCATION '%s' PARTITIONED BY (p) AS "
        "SELECT id AS k, id %% 2 AS p, id * 1.0 AS price "
        "FROM range(0, 20)" % (tmp_path / "c"),
        tables,
    )
    assert res == {"op": "create", "table": "leads", "rows": 20, "version": 1}
    t = tables["leads"]
    assert t.snapshot().partition_by == ("p",)
    assert all("__txp_p=" in f for f in t.snapshot().files)
    execute_dml(spark, "ALTER TABLE leads ADD COLUMN note string", tables)
    execute_dml(
        spark, "ALTER TABLE leads RENAME COLUMN price TO amount", tables
    )
    execute_dml(
        spark,
        "ALTER TABLE leads ADD CONSTRAINT amt_pos CHECK (amount >= 0)",
        tables,
    )
    with pytest.raises(Exception):
        execute_dml(
            spark, "UPDATE leads SET amount = -5 WHERE k = 1", tables
        )
    execute_dml(spark, "ALTER TABLE leads DROP CONSTRAINT amt_pos", tables)
    execute_dml(spark, "UPDATE leads SET amount = -5 WHERE k = 1", tables)
    execute_dml(spark, "ALTER TABLE leads DROP COLUMN note", tables)
    assert t.read().columns == ["k", "p", "amount"]
    assert t.read().filter(F.col("amount") < 0).count() == 1
    with pytest.raises(ValueError, match="already registered"):
        execute_dml(
            spark,
            "CREATE TABLE leads LOCATION '%s' AS SELECT 1 AS x"
            % (tmp_path / "c2"),
            tables,
        )
    with pytest.raises(ValueError, match="ALTER TABLE action"):
        execute_dml(spark, "ALTER TABLE leads SET TBLPROPERTIES x", tables)


def test_sql_route_matches_ingest_engine(spark, tmp_path):
    """Reference-parity pin: the generated-SQL route (INSERT INTO …
    SELECT TRY_CAST + UPDATE … WHERE Ingestion_date IS NULL — the
    statements big_uery_handler.py:158-165/:188-192 emit) must
    produce EXACTLY what the reconciliation engine (sources/ingest.py
    reconcile + stamp_ingestion_date) computes on the same dirty
    input — two spellings, one semantics."""
    from datetime import date

    from pyspark.sql.types import (
        DateType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from etl_pipeline_fresh_picked_leads_spark.sources.ingest import (
        reconcile,
        stamp_ingestion_date,
    )

    raw = spark.range(0, 40).select(
        F.concat(
            F.col("id").cast("string"),
            F.when(F.col("id") % 7 == 0, F.lit("x")).otherwise(F.lit("")),
        ).alias("k"),
        (F.col("id") * 1.5).cast("string").alias("amount"),
        F.lit("dropme").alias("utm_campaign"),  # input-only: dropped
    )
    target = StructType(
        [
            StructField("k", LongType()),
            StructField("amount", DoubleType()),
            StructField("note", StringType()),  # target-only: NULL
            StructField("Ingestion_date", DateType()),
        ]
    )
    engine = stamp_ingestion_date(
        reconcile(raw, target), run_date=date(2024, 6, 1)
    )
    t = TxTable.create(
        spark, str(tmp_path / "sqlroute"), engine.limit(0)
    )
    raw.createOrReplaceTempView("sqlroute_landing")
    execute_dml(
        spark,
        "INSERT INTO t (k, amount, note) SELECT TRY_CAST(k AS BIGINT),"
        " TRY_CAST(amount AS DOUBLE), CAST(NULL AS STRING) "
        "FROM sqlroute_landing",
        {"t": t},
    )
    execute_dml(
        spark,
        "UPDATE t SET Ingestion_date = DATE '2024-06-01' "
        "WHERE Ingestion_date IS NULL",
        {"t": t},
    )
    got = {tuple(r) for r in t.read().collect()}
    want = {tuple(r) for r in engine.collect()}
    assert got == want and len(want) == 40


def test_set_report_rows_single_pass(spark, tmp_path):
    """set_report_rows(False): INSERT/CTAS skip the persist + count
    pass (the 100 TB single-pass mode) — rows comes back None, the
    data still lands."""
    from etl_pipeline_fresh_picked_leads_spark.sources import sqldml

    t = _mk(spark, tmp_path)
    sqldml.set_report_rows(False)
    try:
        n_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        res = execute_dml(
            spark,
            "INSERT INTO t SELECT id, id * 1.0, 'SP' FROM range(50, 55)",
            {"t": t},
        )
        assert res["rows"] is None
        assert (
            spark.sparkContext._jsc.sc().getPersistentRDDs().size()
            == n_before
        )
        tables = {}
        res = execute_dml(
            spark,
            "CREATE TABLE c LOCATION '%s' AS SELECT 1 AS x"
            % (tmp_path / "c"),
            tables,
        )
        assert res["rows"] is None and tables["c"].read().count() == 1
    finally:
        sqldml.set_report_rows(True)
    assert t.read().filter(F.col("pri") == "SP").count() == 5


def test_merge_refuses_delete_listed_before_update(spark, tmp_path):
    """ADVICE r13: the engine's clause order is fixed (UPDATE before
    DELETE); a statement listing DELETE first would silently diverge
    from Delta/ANSI listed-order evaluation on rows satisfying both
    conditions — it must refuse, never reorder silently."""
    t = _mk(spark, tmp_path)
    _df(spark, 0, 5, pri="S").createOrReplaceTempView("dml_ord_src")
    with pytest.raises(ValueError, match="UPDATE before DELETE"):
        execute_dml(
            spark,
            """
            MERGE INTO t AS t USING dml_ord_src AS s ON t.k = s.k
            WHEN MATCHED AND t.k % 3 = 0 THEN DELETE
            WHEN MATCHED AND s.k % 2 = 0 THEN UPDATE SET pri = s.pri
            """,
            {"t": t},
        )
    # delete-only and update-then-delete orderings still parse
    res = execute_dml(
        spark,
        """
        MERGE INTO t AS t USING dml_ord_src AS s ON t.k = s.k
        WHEN MATCHED AND s.k % 2 = 0 THEN UPDATE SET pri = s.pri
        WHEN MATCHED AND t.k % 3 = 0 THEN DELETE
        """,
        {"t": t},
    )
    assert res["updated"] == 3 and res["deleted"] == 1  # 0,2,4 upd; 3 del


def test_merge_source_paren_in_string_literal(spark, tmp_path):
    """ADVICE r13: the USING (<query>) close-paren scan is quote-aware
    — a ')' inside a string literal in the subquery must not truncate
    it."""
    t = _mk(spark, tmp_path)
    res = execute_dml(
        spark,
        "MERGE INTO t t USING (SELECT id AS k, id * 1.0 AS price, "
        "'a)b(c' AS pri FROM range(20, 23)) s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT *",
        {"t": t},
    )
    assert res["inserted"] == 3
    assert t.read().filter(F.col("pri") == "a)b(c").count() == 3


def test_execute_sql_current_and_version_pins(spark, tmp_path):
    """execute_sql (r14, VERDICT r13 #4): SELECT over a registered
    TxTable with per-reference time travel — a self-join of the
    current snapshot against FOR VERSION AS OF 1 sees both states."""
    from etl_pipeline_fresh_picked_leads_spark.sources.sqldml import (
        execute_sql,
    )

    t = _mk(spark, tmp_path)  # v1: keys 0..9, pri P
    execute_dml(
        spark, "UPDATE t SET pri = 'Q' WHERE k % 2 = 0", {"t": t}
    )
    # current state
    got = execute_sql(
        spark, "SELECT COUNT(*) AS n FROM t WHERE pri = 'Q'", {"t": t}
    ).collect()
    assert got[0].n == 5
    # pinned state: v1 has no Q rows
    got = execute_sql(
        spark,
        "SELECT COUNT(*) AS n FROM t FOR VERSION AS OF 1 WHERE pri = 'Q'",
        {"t": t},
    ).collect()
    assert got[0].n == 0
    # self-join current vs pinned, explicit aliases + qualifiers
    got = execute_sql(
        spark,
        """
        SELECT cur.k AS k, cur.pri AS now_pri, old.pri AS then_pri
        FROM t cur JOIN t FOR VERSION AS OF 1 AS old ON cur.k = old.k
        WHERE cur.pri <> old.pri
        """,
        {"t": t},
    ).collect()
    assert len(got) == 5 and all(
        r.now_pri == "Q" and r.then_pri == "P" for r in got
    )


def test_execute_sql_timestamp_and_system_time_pins(spark, tmp_path):
    from etl_pipeline_fresh_picked_leads_spark.sources.sqldml import (
        execute_sql,
    )

    t = _mk(spark, tmp_path)
    execute_dml(spark, "DELETE FROM t WHERE k >= 5", {"t": t})
    # history()-derived probe bounds (never wall-clock literals):
    # tz-aware datetimes, passed as quoted ISO strings
    ts = {e["version"]: e["timestamp"].isoformat() for e in t.history()}
    for spelling in ("TIMESTAMP", "SYSTEM_TIME"):
        got = execute_sql(
            spark,
            f"SELECT COUNT(*) AS n FROM t FOR {spelling} AS OF '{ts[1]}'",
            {"t": t},
        ).collect()
        assert got[0].n == 10, spelling
    got = execute_sql(
        spark,
        f"SELECT COUNT(*) AS n FROM t FOR TIMESTAMP AS OF '{ts[2]}'",
        {"t": t},
    ).collect()
    assert got[0].n == 5


def test_execute_sql_guards(spark, tmp_path):
    from etl_pipeline_fresh_picked_leads_spark.sources.sqldml import (
        execute_sql,
    )

    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="read-only"):
        execute_sql(spark, "DELETE FROM t", {"t": t})
    with pytest.raises(ValueError, match="shadows"):
        execute_sql(
            spark,
            "WITH t AS (SELECT 1 AS x) SELECT * FROM t",
            {"t": t},
        )
    with pytest.raises(ValueError, match="no registered TxTable"):
        execute_sql(spark, "SELECT 1 AS one", {"t": t})
    with pytest.raises(ValueError, match="integer"):
        execute_sql(spark, "SELECT * FROM t FOR VERSION AS OF 'x'", {"t": t})
    # a string literal containing the table name must not rewrite
    got = execute_sql(
        spark,
        "SELECT COUNT(*) AS n, 't' AS tag FROM t",
        {"t": t},
    ).collect()
    assert got[0].n == 10 and got[0].tag == "t"


def test_execute_sql_table_changes_and_describe_history(spark, tmp_path):
    """r14: the Delta CDF TVF spelling and DESCRIBE HISTORY.
    TABLE_CHANGES('t', start[, end]) takes INCLUSIVE commit versions
    (rewritten to read_changes(start-1, end))."""
    from etl_pipeline_fresh_picked_leads_spark.sources.sqldml import (
        execute_sql,
    )

    t = _mk(spark, tmp_path)  # v1: keys 0..9
    execute_dml(spark, "DELETE FROM t WHERE k >= 8", {"t": t})  # v2
    execute_dml(
        spark,
        "INSERT INTO t SELECT id, id * 1.0, 'N' FROM range(20, 23)",
        {"t": t},
    )  # v3
    got = execute_sql(
        spark,
        "SELECT _change_type, COUNT(*) AS n "
        "FROM TABLE_CHANGES('t', 2, 2) GROUP BY 1",
        {"t": t},
    ).collect()
    assert {r._change_type: r.n for r in got} == {"delete": 2}
    got = execute_sql(
        spark,
        "SELECT c.k AS k FROM TABLE_CHANGES('t', 2, 3) c "
        "WHERE c._change_type = 'insert' ORDER BY k",
        {"t": t},
    ).collect()
    assert [r.k for r in got] == [20, 21, 22]
    hist = execute_sql(spark, "DESCRIBE HISTORY t", {"t": t}).collect()
    assert [r.version for r in hist] == [3, 2, 1]
    assert hist[0].op == "append" and hist[-1].op in ("create", "overwrite")
    assert all(r.timestamp is not None for r in hist)
    with pytest.raises(ValueError, match="DESCRIBE"):
        execute_sql(spark, "DESCRIBE EXTENDED t", {"t": t})


def test_execute_sql_show_partitions_and_describe_detail(spark, tmp_path):
    from etl_pipeline_fresh_picked_leads_spark.sources.sqldml import (
        execute_sql,
    )

    t = TxTable.create(
        spark,
        str(tmp_path / "sp"),
        spark.range(0, 40).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("p")
        ),
        partition_by=["p"],
    )
    t.add_constraint("k_pos", "k >= 0")
    got = {
        r.p: (r.n_files, r.n_rows)
        for r in execute_sql(spark, "SHOW PARTITIONS sp", {"sp": t}).collect()
    }
    assert set(got) == {"0", "1", "2"}
    assert sum(n for _, n in got.values()) == 40
    d = execute_sql(spark, "DESCRIBE DETAIL sp", {"sp": t}).collect()
    assert len(d) == 1
    row = d[0]
    assert row.format == "txtable" and row.version == t.snapshot().version
    assert row.num_files == len(t.snapshot().files)
    assert row.partition_columns == ["p"] and row.constraints == ["k_pos"]
    assert row.n_rows == 40 and row.size_bytes > 0
    # DVs make per-file row counts upper bounds -> n_rows goes unknown
    t.delete_dv(F.col("k") % 7 == 0)
    row2 = execute_sql(spark, "DESCRIBE DETAIL sp", {"sp": t}).collect()[0]
    assert row2.n_rows is None
    with pytest.raises(ValueError, match="SHOW PARTITIONS"):
        execute_sql(spark, "SHOW TABLES", {"sp": t})


def test_execute_sql_review_hardening(spark, tmp_path):
    """r14 review findings: backslash-escaped quotes keep the mask in
    sync, TABLE_CHANGES inside a literal is content, the CTE
    column-list form still refuses, an AS-alias equal to a table name
    never rewrites, and per-call temp views are dropped."""
    from etl_pipeline_fresh_picked_leads_spark.sources.sqldml import (
        execute_sql,
    )

    t = _mk(spark, tmp_path)  # keys 0..9
    # backslash-escaped quote inside a literal: the ' t ' inside must
    # NOT rewrite; the trailing FROM t must
    got = execute_sql(
        spark,
        "SELECT 'x\\' t \\'y' AS s, COUNT(*) AS n FROM t",
        {"t": t},
    ).collect()
    assert got[0].n == 10 and got[0].s == "x' t 'y"
    # TABLE_CHANGES spelling inside a literal is content — no CDF scan
    got = execute_sql(
        spark,
        "SELECT \"see TABLE_CHANGES('t', 2)\" AS hint, COUNT(*) AS n "
        "FROM t",
        {"t": t},
    ).collect()
    assert got[0].hint == "see TABLE_CHANGES('t', 2)" and got[0].n == 10
    # CTE column-list form shadows too
    with pytest.raises(ValueError, match="shadows"):
        execute_sql(
            spark,
            "WITH t (a) AS (SELECT 1) SELECT a FROM t",
            {"t": t},
        )
    # a column alias equal to the registered name is not a table ref
    got = execute_sql(
        spark,
        "SELECT k AS t FROM t WHERE k < 3",
        {"t": t},
    ).collect()
    assert sorted(r.t for r in got) == [0, 1, 2]
    # per-call temp views are dropped once the plan is built (and the
    # returned frame stays collectable after the drop)
    before = {v.name for v in spark.catalog.listTables() if v.isTemporary}
    df = execute_sql(spark, "SELECT COUNT(*) AS n FROM t", {"t": t})
    after = {v.name for v in spark.catalog.listTables() if v.isTemporary}
    assert not {v for v in after - before if v.startswith("_txsql")}
    assert df.collect()[0].n == 10


def test_merge_source_backslash_escaped_paren_literal(spark, tmp_path):
    """_match_paren shares the escape-aware scanner: a \\' followed
    by ')' inside the USING (<query>) literal must not truncate it."""
    t = _mk(spark, tmp_path)
    res = execute_dml(
        spark,
        "MERGE INTO t t USING (SELECT id AS k, id * 1.0 AS price, "
        "'a\\')' AS pri FROM range(30, 32)) s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT *",
        {"t": t},
    )
    assert res["inserted"] == 2
    assert t.read().filter(F.col("pri") == "a')").count() == 2


def test_execute_sql_advice_r14_fixes(spark, tmp_path):
    """ADVICE r14: quoted CTE definitions shadow (a backtick-quoted
    CTE previously slipped the guard and its bare references were
    silently rewritten to the table); a bare alias equal to a
    registered name is not a table reference; /* */ block comments
    strip quote-aware (an apostrophe inside one must not
    desynchronize the mask)."""
    from etl_pipeline_fresh_picked_leads_spark.sources.sqldml import (
        _strip,
        execute_sql,
    )

    t = _mk(spark, tmp_path)  # keys 0..9
    # backtick-quoted CTE definition, bare reference: must refuse,
    # never silently read the table
    with pytest.raises(ValueError, match="shadows"):
        execute_sql(
            spark,
            "WITH `t` AS (SELECT 1 AS a) SELECT a FROM t",
            {"t": t},
        )
    with pytest.raises(ValueError, match="shadows"):
        execute_sql(
            spark,
            'WITH "t" AS (SELECT 1 AS a) SELECT a FROM t',
            {"t": t},
        )
    # bare alias position: "FROM sub t" aliases the subquery — the
    # trailing bare t must NOT be rewritten into a table reference
    got = execute_sql(
        spark,
        "SELECT t.k FROM (SELECT 1 AS k) t WHERE t.k = 1",
        {"t": t},
    ).collect()
    assert [r.k for r in got] == [1]
    # block comments: stripped, token separation kept, apostrophe
    # inside one leaves the quote mask in sync
    assert _strip("SELECT/*x*/1").strip() == "SELECT 1"
    got = execute_sql(
        spark,
        "SELECT /* don't */ COUNT(*) AS n FROM t /* it's fine */",
        {"t": t},
    ).collect()
    assert got[0].n == 10
    # a comment marker inside a string literal is content
    got = execute_sql(
        spark,
        "SELECT '/* keep */' AS s, COUNT(*) AS n FROM t",
        {"t": t},
    ).collect()
    assert got[0].s == "/* keep */" and got[0].n == 10
