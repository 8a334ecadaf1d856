"""Property-based reconciliation invariants (SURVEY §5.2 item 4):
whatever the input schema/values, ingest never throws, output schema
equals the target, and row counts are preserved.
"""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_pipeline_fresh_picked_leads_spark.sources.ingest import reconcile

_colname = st.text(string.ascii_lowercase, min_size=1, max_size=8)
_cell = st.one_of(
    st.none(),
    st.integers(-(10**12), 10**12).map(str),
    st.floats(allow_nan=False, allow_infinity=False).map(str),
    st.text(string.printable, max_size=20),
    st.sampled_from(["true", "false", "2024-01-01", "13/45/2020", "n/a", ""]),
)
_target_type = st.sampled_from(
    [LongType(), DoubleType(), BooleanType(), DateType(), StringType()]
)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_reconcile_total_and_shape_preserving(spark, data):
    src_cols = data.draw(
        st.lists(_colname, min_size=1, max_size=5, unique=True)
    )
    tgt_cols = data.draw(
        st.lists(_colname, min_size=1, max_size=5, unique=True)
    )
    target = StructType(
        [StructField(c, data.draw(_target_type)) for c in tgt_cols]
    )
    n_rows = data.draw(st.integers(1, 5))
    rows = [
        tuple(data.draw(_cell) for _ in src_cols) for _ in range(n_rows)
    ]
    raw = spark.createDataFrame(
        rows, schema=StructType([StructField(c, StringType()) for c in src_cols])
    )

    out = reconcile(raw, target)  # must never raise (SAFE_CAST contract)
    assert out.schema == target            # exact target schema, in order
    assert out.count() == n_rows           # row count preserved
    out.collect()                          # and materializes cleanly


# --- MinHash-LSH invariants under arbitrary corpora ------------------------

_word = st.text(string.ascii_lowercase, min_size=1, max_size=6)
_doc = st.lists(_word, min_size=0, max_size=30).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc, min_size=2, max_size=12))
def test_lsh_precision_and_exact_dup_recall(spark, texts):
    """Whatever the corpus: (1) every reported pair's jaccard is >=
    the threshold AND equals the true shingle-set jaccard (exact
    verification => precision 1.0 on the jaccard predicate); (2) docs
    with identical token streams of >= 3 tokens share every band key,
    so exact duplicates are ALWAYS found (recall 1.0 on the
    duplicate subset, the guarantee content-hash dedup relies on)."""
    from etl_pipeline_fresh_picked_leads_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.5).collect()

    def sh(t):
        toks = [w for w in t.lower().strip().split() if w]
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    by_id = {i: sh(t) for i, t in enumerate(texts)}
    for r in pairs:
        a, b = by_id[r.doc_id_a], by_id[r.doc_id_b]
        true_j = len(a & b) / len(a | b) if a | b else None
        assert true_j is not None and true_j >= 0.5
        assert abs(r.jaccard - true_j) < 1e-9

    found = {(r.doc_id_a, r.doc_id_b) for r in pairs}
    for i, ti in enumerate(texts):
        for j in range(i + 1, len(texts)):
            norm_i = " ".join(ti.lower().split())
            norm_j = " ".join(texts[j].lower().split())
            if norm_i == norm_j and len(norm_i.split()) >= 3:
                assert (i, j) in found


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_distwindow_global_rank_matches_vanilla(spark, data):
    """Property: for ANY value distribution (duplicates, negatives,
    skewed clusters) and partition count, the distributed global rank
    equals the single-partition ROW_NUMBER, and NTILE derived from it
    equals built-in ntile."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from etl_pipeline_fresh_picked_leads_spark.operators.distwindow import (
        global_rank,
        ntile_expr,
    )

    n = data.draw(st.integers(3, 120))
    npart = data.draw(st.sampled_from([2, 3, 8, 16]))
    buckets = data.draw(st.integers(2, 7))
    vals = data.draw(
        st.lists(
            st.integers(-50, 50).map(float), min_size=n, max_size=n
        )
    )
    df = spark.createDataFrame(list(enumerate(vals)), "k long, v double")
    ranked, total = global_rank(df, ["v", "k"], npart=npart)
    assert total == n
    got = {
        (r.k, r.rk, r.q)
        for r in ranked.select(
            "k",
            F.col("_grank").alias("rk"),
            ntile_expr("_grank", total, buckets).alias("q"),
        ).collect()
    }
    w = W.orderBy("v", "k")
    want = {
        (r.k, r.rk, r.q)
        for r in df.select(
            "k",
            F.row_number().over(w).cast("long").alias("rk"),
            F.ntile(buckets).over(w).alias("q"),
        ).collect()
    }
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_closure_matches_python_reference_on_random_graphs(spark, data):
    """closure() vs a driver-side reference on arbitrary in-degree<=1
    graphs (forests, cycles, rho-shapes, self-loop roots, duplicate
    edges): forests must return exact pointer-chase roots; any graph
    containing a cycle must return component-minimum labels (star
    semantics) — never crash, hang, or drop vertices."""
    from etl_pipeline_fresh_picked_leads_spark.operators.graph import closure

    n = data.draw(st.integers(2, 24))
    ids = list(range(n))
    # each vertex gets 0 or 1 parent (possibly itself = root marker)
    parent_of = {
        v: data.draw(
            st.one_of(st.none(), st.sampled_from(ids)), label=f"parent_{v}"
        )
        for v in ids
    }
    edges = [(v, p) for v, p in parent_of.items() if p is not None]
    # duplicate some edges (must not trip the multiplicity probe)
    if edges:
        edges += [edges[0]] * data.draw(st.integers(0, 2))

    # ---- python reference ----
    def walk(v, limit):
        seen = []
        while limit and parent_of.get(v) is not None and parent_of[v] != v:
            if v in seen:
                return None  # cycle
            seen.append(v)
            v = parent_of[v]
            limit -= 1
        return v if limit else None

    roots = {v: walk(v, n + 1) for v in ids}
    has_cycle = any(r is None for r in roots.values())
    if has_cycle:
        # undirected component minima
        import itertools

        comp = {v: v for v in ids}

        def find(v):
            while comp[v] != v:
                comp[v] = comp[comp[v]]
                v = comp[v]
            return v

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                comp[max(ra, rb)] = min(ra, rb)
        # path-compress to the true minimum per component
        for v in ids:
            find(v)
        mins = {}
        for v in ids:
            r = find(v)
            mins[r] = min(mins.get(r, v), v)
        expected = {v: mins[find(v)] for v in ids}
    else:
        expected = roots

    verts = spark.createDataFrame([(v,) for v in ids], "id long")
    e = spark.createDataFrame(
        edges or [(None, None)], "child long, parent long"
    ).dropna()
    got = {r["id"]: r["root"] for r in closure(verts, e).collect()}
    assert got == expected, (edges, has_cycle)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_txtable_op_sequences_match_reference_model(spark, data, tmp_path_factory):
    """Randomized op sequences (append / overwrite / upsert / delete /
    add_column / drop_column / rename_column / add_constraint /
    drop_constraint / restore) against an in-memory reference model:
    after every op the table's visible rows equal the model, writes
    violating a live CHECK constraint raise and commit NOTHING, and
    restore to any recorded version replays the model's history — the
    whole-format linearizability check no single-op test gives.
    Merge-on-read mutations (delete_dv / update_dv, r9) enter the
    same pool: they must be indistinguishable from their CoW twins in
    every visible state, including across restore (vectors restore
    WITH the file list) and time travel.

    The model keys history by the table's ACTUAL committed version
    (``t.snapshot().version``), not by op count — ops that commit no
    new version (restore to the current head) must not drift the
    arithmetic, and zero-match deletes commit an empty-change version
    (Delta parity, r8) which the recording picks up automatically
    (VERDICT/ADVICE r7)."""
    import pytest

    from etl_pipeline_fresh_picked_leads_spark.sources.txtable import (
        TxConstraintViolation,
        TxTable,
    )

    root = str(tmp_path_factory.mktemp("txprop") / "t")
    cols = ["k", "v"]  # k: key, v: payload; extra columns may be added
    extra: list[str] = []
    dropped: set[str] = set()
    cons: dict[str, int] = {}  # live constraints: name -> floor ("k >= kc")

    def violates(rows):
        return any(r["k"] < kc for kc in cons.values() for r in rows)
    model: dict[int, dict] = {}
    # committed version -> (visible rows, extra columns, constraints)
    versions: dict[int, tuple[dict, list[str], dict]] = {}

    def df_of(rows):
        schema = ", ".join(
            ["k int", "v int"] + [f"{c} int" for c in extra]
        )
        return spark.createDataFrame(
            [tuple(r[c] for c in cols + extra) for r in rows], schema
        ).coalesce(1)

    def fresh_rows(n):
        return [
            {
                "k": data.draw(st.integers(0, 9), label="k"),
                "v": data.draw(st.integers(0, 99), label="v"),
                **{c: None for c in extra},
            }
            for _ in range(n)
        ]

    def record():
        versions[t.snapshot().version] = (
            {i: dict(r) for i, r in model.items()},
            list(extra),
            dict(cons),
        )

    t = TxTable.create(spark, root, df_of(fresh_rows(2)))
    # rebuild model from what create committed
    first = [
        {**{c: r[c] for c in cols + extra}}
        for r in t.read().collect()
    ]
    model = {i: r for i, r in enumerate(first)}
    next_id = len(model)
    record()

    from etl_pipeline_fresh_picked_leads_spark.streaming.txtable_source import (
        register,
    )

    register(spark)
    n_ops = data.draw(st.integers(2, 6), label="n_ops")
    for _ in range(n_ops):
        choices = [
            "append", "overwrite", "delete", "add_column", "upsert",
            "add_constraint", "merge", "replace_where", "delete_dv",
            "update_dv", "source_read", "sink_commit",
        ]
        if extra:
            choices += ["drop_column", "rename_column"]
        if cons:
            choices.append("drop_constraint")
        if len(versions) >= 2:
            choices.append("restore")
        op = data.draw(st.sampled_from(choices), label="op")
        if op == "append":
            rows = fresh_rows(data.draw(st.integers(1, 3), label="n"))
            if violates(rows):  # refused atomically: model unchanged
                with pytest.raises(TxConstraintViolation):
                    t.append(df_of(rows))
            else:
                t.append(df_of(rows))
                for r in rows:
                    model[next_id] = r
                    next_id += 1
        elif op == "overwrite":
            rows = fresh_rows(data.draw(st.integers(1, 2), label="n"))
            if violates(rows):
                with pytest.raises(TxConstraintViolation):
                    t.overwrite(df_of(rows))
            else:
                t.overwrite(df_of(rows))
                model = {}
                for r in rows:
                    model[next_id] = r
                    next_id += 1
        elif op == "upsert":
            rows = fresh_rows(data.draw(st.integers(1, 2), label="n"))
            # upsert batches must be key-unique (documented contract)
            uniq = {r["k"]: r for r in rows}
            rows = list(uniq.values())
            if violates(rows):
                with pytest.raises(TxConstraintViolation):
                    t.upsert(df_of(rows), "k")
            else:
                t.upsert(df_of(rows), "k")
                keys = {r["k"] for r in rows}
                model = {
                    i: r for i, r in model.items() if r["k"] not in keys
                }
                for r in rows:
                    model[next_id] = r
                    next_id += 1
        elif op == "merge":
            # key-unique source (the ambiguity guard is covered by its
            # own unit test); clause mix drawn per op
            rows = fresh_rows(data.draw(st.integers(1, 3), label="mn"))
            rows = list({r["k"]: r for r in rows}.values())
            with_update = data.draw(st.booleans(), label="mu")
            uc = data.draw(st.integers(0, 99), label="muc")
            with_delete = data.draw(st.booleans(), label="md")
            dc = data.draw(st.integers(0, 99), label="mdc")
            do_insert = data.draw(st.booleans(), label="mi")
            # replay of the engine's clause semantics on the model:
            # update claims first, delete only unclaimed matches,
            # unmatched sources insert
            next_model = {i: dict(r) for i, r in model.items()}
            inserted = []
            for s_row in rows:
                matched = [
                    i for i, r in next_model.items() if r["k"] == s_row["k"]
                ]
                if matched:
                    for i in matched:
                        if with_update and s_row["v"] >= uc:
                            next_model[i] = dict(s_row)
                        elif with_delete and s_row["v"] < dc:
                            del next_model[i]
                elif do_insert:
                    inserted.append(s_row)
            # constraints bind on k, merge keys on k: updates can never
            # violate; only INSERTED rows can
            call = lambda: t.merge(  # noqa: E731
                df_of(rows),
                "k",
                update="all" if with_update else None,
                update_condition=f"s.v >= {uc}" if with_update else None,
                delete_condition=f"s.v < {dc}" if with_delete else None,
                insert=do_insert,
            )
            if violates(inserted):
                with pytest.raises(TxConstraintViolation):
                    call()
            else:
                call()
                model = next_model
                for r in inserted:
                    model[next_id] = r
                    next_id += 1
        elif op == "replace_where":
            key = data.draw(st.integers(0, 9), label="rwk")
            rows = fresh_rows(data.draw(st.integers(1, 2), label="rwn"))
            for r in rows:
                r["k"] = key
            if data.draw(st.booleans(), label="rwbad"):
                # one row outside the slice: refused loudly, nothing
                # committed, model unchanged
                bad = dict(rows[0])
                bad["k"] = key + 1
                with pytest.raises(ValueError, match="do not satisfy"):
                    t.replace_where(df_of(rows + [bad]), F.col("k") == key)
            elif violates(rows):
                with pytest.raises(TxConstraintViolation):
                    t.replace_where(df_of(rows), F.col("k") == key)
            else:
                t.replace_where(df_of(rows), F.col("k") == key)
                model = {i: r for i, r in model.items() if r["k"] != key}
                for r in rows:
                    model[next_id] = r
                    next_id += 1
        elif op == "add_constraint":
            kc = data.draw(st.integers(0, 9), label="kc")
            name = f"ge{kc}"
            if name in cons:
                continue
            if any(r["k"] < kc for r in model.values()):
                # can't be born violated; nothing committed
                with pytest.raises(TxConstraintViolation):
                    t.add_constraint(name, f"k >= {kc}")
            else:
                t.add_constraint(name, f"k >= {kc}")
                cons[name] = kc
        elif op == "drop_constraint":
            name = data.draw(st.sampled_from(sorted(cons)), label="dc")
            t.drop_constraint(name)
            del cons[name]
        elif op == "delete":
            key = data.draw(st.integers(0, 9), label="delk")
            t.delete(F.col("k") == key)
            model = {i: r for i, r in model.items() if r["k"] != key}
        elif op == "delete_dv":
            # merge-on-read twin of delete: same model transition
            key = data.draw(st.integers(0, 9), label="dvk")
            t.delete_dv(F.col("k") == key)
            model = {i: r for i, r in model.items() if r["k"] != key}
        elif op == "update_dv":
            # constraints bind on k and update_dv sets v: never violates
            key = data.draw(st.integers(0, 9), label="uvk")
            nv = data.draw(st.integers(0, 99), label="uvv")
            t.update_dv(F.col("k") == key, {"v": F.lit(nv)})
            for r in model.values():
                if r["k"] == key:
                    r["v"] = nv
        elif op == "add_column":
            name = data.draw(
                st.sampled_from(["c1", "c2", "c3"]), label="col"
            )
            if name in extra:
                continue
            # re-adding a dropped name is safe under column-mapping
            # ids (r8): the new column must read NULL everywhere
            t.add_column(name, "integer")
            extra.append(name)
            for r in model.values():
                r[name] = None
        elif op == "drop_column":
            name = extra.pop(data.draw(st.integers(0, len(extra) - 1), label="di"))
            t.drop_column(name)
            dropped.add(name)
            for r in model.values():
                r.pop(name, None)
        elif op == "rename_column":
            src = extra[
                data.draw(st.integers(0, len(extra) - 1), label="ri")
            ]
            free = [
                n
                for n in ["r1", "r2", "r3"]
                if n not in extra and n not in cols
            ]
            if not free:
                continue
            dst = data.draw(st.sampled_from(free), label="rdst")
            t.rename_column(src, dst)
            extra[extra.index(src)] = dst
            for r in model.values():
                if src in r:
                    r[dst] = r.pop(src)
        elif op == "source_read":
            # the format("txtable") batch source must agree with the
            # engine read in EVERY randomized table state — colmap
            # projection, DV subtraction, schema evolution (r10,
            # VERDICT r9 #8: the data source vs. concurrent mutations)
            src = (
                spark.read.format("txtable").option("path", root).load()
            )
            got_src = sorted(
                tuple(row[c] for c in cols + extra)
                for row in src.collect()
            )
            want_src = sorted(
                tuple(r.get(c) for c in cols + extra)
                for r in model.values()
            )
            assert got_src == want_src, (got_src, want_src)
            assert src.columns == cols + extra
        elif op == "sink_commit":
            # format("txtable") batch append: constrained tables refuse
            # (the manifest-only sink cannot validate); otherwise the
            # rows land exactly once and — under a colmap — under
            # physical file names the engine reads back logically
            rows = fresh_rows(data.draw(st.integers(1, 2), label="sn"))
            writer = (
                df_of(rows)
                .write.format("txtable")
                .mode("append")
                .option("path", root)
            )
            if cons:
                with pytest.raises(Exception, match="CHECK constraints"):
                    writer.save()
            else:
                writer.save()
                for r in rows:
                    model[next_id] = r
                    next_id += 1
        elif op == "restore":
            v = data.draw(
                st.sampled_from(sorted(versions)), label="rv"
            )
            t.restore(v)
            state, extra_at_v, cons_at_v = versions[v]
            model = {i: dict(r) for i, r in state.items()}
            # restore adopts the target's schema: previously-dropped
            # columns resurface (files intact) but stay name-fenced
            extra[:] = list(extra_at_v)
            # ...and the target's CHECK constraints (metadata restores
            # with the state — the head never advertises a rule its
            # restored data predates)
            cons.clear()
            cons.update(cons_at_v)
        record()

        got = sorted(
            tuple(row[c] for c in cols + extra)
            for row in (
                {f: r[f] for f in t.read().columns}
                for r in t.read().collect()
            )
        )
        want = sorted(
            tuple(r.get(c) for c in cols + extra) for r in model.values()
        )
        assert got == want, (op, extra, got, want)
        assert t.read().columns == cols + extra
        assert set(t.snapshot().constraints or {}) == set(cons), op

    # every recorded version must still time-travel to its model state
    for v, (state, extra_at_v, _cons_at_v) in versions.items():
        snap = sorted(
            tuple(row[c] for c in cols + extra_at_v)
            for row in t.read(version=v).collect()
        )
        want = sorted(
            tuple(r.get(c) for c in cols + extra_at_v)
            for r in state.values()
        )
        assert snap == want, (v, snap, want)


def _ref_remove_dup_spans(rows, n=5):
    """Pure-Python reference of operators/text.remove_dup_spans:
    positional n-grams, cross-doc dup grams keep min (doc_id, pos),
    other occurrences' n positions removed, docs rebuilt."""
    toks = {
        d: [t for t in (txt or "").lower().strip().split() if t]
        for d, txt in rows
    }
    inst: dict = {}
    for d, ts in sorted(toks.items()):
        for p in range(len(ts) - n + 1):
            inst.setdefault(tuple(ts[p : p + n]), []).append((d, p))
    removed: dict = {}
    for occ in inst.values():
        if len({d for d, _ in occ}) >= 2:
            keep = min(occ)
            for d, p in occ:
                if (d, p) != keep:
                    removed.setdefault(d, set()).update(range(p, p + n))
    out = {}
    for d, ts in toks.items():
        kept = [
            t for i, t in enumerate(ts) if i not in removed.get(d, set())
        ]
        out[d] = (" ".join(kept), len(ts), len(kept))
    return out


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_remove_dup_spans_matches_python_reference(spark, data):
    """remove_dup_spans == the brute-force reference on random small
    corpora over a tiny vocabulary (dense 5-gram collisions), at any
    partitioning and under key slicing."""
    from etl_pipeline_fresh_picked_leads_spark.operators.text import (
        remove_dup_spans,
    )

    vocab = ["aa", "bb", "cc", "dd"]
    n_docs = data.draw(st.integers(2, 7))
    rows = []
    for d in range(n_docs):
        toks = data.draw(
            st.lists(st.sampled_from(vocab), min_size=0, max_size=14)
        )
        rows.append((d, " ".join(toks)))
    expect = _ref_remove_dup_spans(rows, n=5)
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    ks = data.draw(st.sampled_from([1, 3]))
    got = {
        r.doc_id: (r.text, r.n_tokens_before, r.n_tokens_after)
        for r in remove_dup_spans(
            docs.repartition(data.draw(st.sampled_from([1, 5]))),
            n=5,
            key_slices=ks,
        ).collect()
    }
    assert got == expect
