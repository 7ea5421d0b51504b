"""Round-14 pins: versioned-table merge fallback + vacuum dry-run +
empty-snapshot reads + commit-temp grace (VERDICT r13 task #6, ADVICE
r13 #2/#3), and the two-star CC non-convergence guard (ADVICE r13 #4).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from utility_service_areas_spark.sources.versioned import (
    diff_versions,
    list_versions,
    merge_version,
    read_version,
    vacuum,
    write_version,
    write_version_bucketed,
)


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _ch(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, op string")


def _rows(spark, t, v=None):
    return {(r.k, r.v) for r in read_version(spark, t, v).collect()}


BASE = [(k, f"base{k}") for k in range(20)]
CHANGES = [(1, "upd1", "U"), (7, "upd7", "U"), (3, "", "D"), (99, "new", "U")]


def _replay(base, changes):
    """Driver-side relational replay of MERGE semantics — the oracle
    the two storage layouts must both match."""
    d = dict(base)
    for k, v, op in changes:
        if op == "U":
            d[k] = v
        else:
            d.pop(k, None)
    return set(d.items())


def test_merge_fallback_matches_bucketed_and_replay(spark, tmp_path):
    """VERDICT r13 task #6: MERGE on a plain write_version lineage
    (full rewrite) commits the SAME row set as the bucketed
    copy-on-write merge over identical base+changes, and both equal
    the relational replay."""
    plain = str(tmp_path / "plain")
    bucketed = str(tmp_path / "bucketed")
    write_version(_kv(spark, BASE), plain)
    write_version_bucketed(_kv(spark, BASE), bucketed, ["k"], 4)

    v_plain = merge_version(spark, plain, _ch(spark, CHANGES), key_cols=["k"])
    v_buck = merge_version(spark, bucketed, _ch(spark, CHANGES))

    want = _replay(BASE, CHANGES)
    assert _rows(spark, plain, v_plain) == want
    assert _rows(spark, bucketed, v_buck) == want
    # time travel intact on the plain lineage too
    assert _rows(spark, plain, 0) == set(BASE)
    man = json.load(open(os.path.join(plain, f"_v{v_plain}.json")))
    assert man["mode"] == "merge" and man["merge_base"] == 0
    assert len(man["data_dirs"]) == 1  # full rewrite = one new dir


def test_merge_fallback_requires_key_cols(spark, tmp_path):
    t = str(tmp_path / "plain")
    write_version(_kv(spark, BASE), t)
    with pytest.raises(ValueError, match="key_cols"):
        merge_version(spark, t, _ch(spark, CHANGES))
    # and a bucketed table refuses a CONFLICTING key_cols
    b = str(tmp_path / "bucketed")
    write_version_bucketed(_kv(spark, BASE), b, ["k"], 4)
    with pytest.raises(ValueError, match="bucket key"):
        merge_version(spark, b, _ch(spark, CHANGES), key_cols=["v"])
    # matching key_cols on a bucketed table is accepted
    v = merge_version(spark, b, _ch(spark, CHANGES), key_cols=["k"])
    assert _rows(spark, b, v) == _replay(BASE, CHANGES)


def test_all_deleted_snapshot_reads_empty_with_schema(spark, tmp_path):
    """ADVICE r13 #2: a version whose every row was deleted is a VALID
    empty snapshot — read_version returns a zero-row frame with the
    manifest's schema instead of raising from a zero-path parquet
    read, on BOTH layouts; diff_versions across it works."""
    small = [(1, "a"), (2, "b")]
    wipe = [(1, "", "D"), (2, "", "D")]
    for name, setup in (
        ("plain", lambda t: write_version(_kv(spark, small), t)),
        (
            "bucketed",
            lambda t: write_version_bucketed(_kv(spark, small), t, ["k"], 2),
        ),
    ):
        t = str(tmp_path / name)
        setup(t)
        v = merge_version(
            spark,
            t,
            _ch(spark, wipe),
            key_cols=["k"] if name == "plain" else None,
        )
        empty = read_version(spark, t, v)
        assert empty.count() == 0
        assert sorted(
            (f.name, f.dataType.simpleString()) for f in empty.schema.fields
        ) == [("k", "bigint"), ("v", "string")]
        d = diff_versions(spark, t, 0, v)
        assert d["removed"] == 2 and d["n_rows_new"] == 0
        # and the table accepts a fresh merge after total deletion
        v2 = merge_version(
            spark,
            t,
            _ch(spark, [(5, "back", "U")]),
            key_cols=["k"] if name == "plain" else None,
        )
        assert _rows(spark, t, v2) == {(5, "back")}


def test_vacuum_dry_run_plans_without_deleting(spark, tmp_path):
    """VERDICT r13 task #6: dry_run returns the exact would-delete set
    (manifests + dirs by name) and touches NOTHING; the real vacuum
    then deletes exactly that plan."""
    t = str(tmp_path / "tbl")
    write_version_bucketed(_kv(spark, BASE), t, ["k"], 4)
    merge_version(spark, t, _ch(spark, [(1, "m1", "U")]))
    merge_version(spark, t, _ch(spark, [(2, "m2", "U")]))
    all_rows = _rows(spark, t)
    files_before = sorted(
        os.path.join(r, x)
        for r, _d, fs in os.walk(t)
        for x in fs
    )

    plan = vacuum(t, keep_last=1, dry_run=True)
    assert plan["dry_run"] is True
    assert plan["manifests"] == ["_v0.json", "_v1.json"]
    assert plan["manifests_removed"] == 2
    assert plan["dirs_removed"] == len(plan["dirs"]) > 0
    # nothing touched: every file still present, all versions readable
    files_after = sorted(
        os.path.join(r, x)
        for r, _d, fs in os.walk(t)
        for x in fs
    )
    assert files_after == files_before
    assert list_versions(t) == [0, 1, 2]

    real = vacuum(t, keep_last=1)
    assert real["manifests"] == plan["manifests"]
    assert real["dirs"] == plan["dirs"]
    assert list_versions(t) == [2]
    assert _rows(spark, t) == all_rows


def test_vacuum_spares_young_commit_temps(spark, tmp_path):
    """ADVICE r13 #3: a temp younger than the grace window (a writer
    mid-claim) SURVIVES vacuum; a stale temp (backdated mtime) is
    swept. The claim loops additionally retry on FileNotFoundError."""
    t = str(tmp_path / "tbl")
    write_version(_kv(spark, [(1, "a")]), t)
    young = os.path.join(t, "_tmp-v9-young.json")
    stale = os.path.join(t, "_tmp-v9-stale.json")
    for p in (young, stale):
        with open(p, "w") as f:
            f.write("{}")
    os.utime(stale, (0, 0))  # ancient

    plan = vacuum(t, keep_last=1, dry_run=True)
    assert plan["tmps"] == ["_tmp-v9-stale.json"]
    vacuum(t, keep_last=1)
    assert os.path.exists(young) and not os.path.exists(stale)
    # tmp_grace_seconds=0 restores the sweep-everything behavior
    vacuum(t, keep_last=1, tmp_grace_seconds=0)
    assert not os.path.exists(young)


def test_vacuum_spares_young_orphan_data_dirs(spark, tmp_path):
    """r14 review #3: a data dir referenced by NO manifest may be an
    IN-FLIGHT commit (parquet lands seconds before the manifest claim)
    — vacuum must spare it until it ages past the grace window, else a
    writer can commit a readable manifest pointing at deleted data.
    Dirs referenced by EXPIRED manifests were durably committed and go
    regardless of age."""
    t = str(tmp_path / "tbl")
    write_version(_kv(spark, [(1, "a")]), t)
    write_version(_kv(spark, [(2, "b")]), t, mode="overwrite")  # v0 expires

    young = os.path.join(t, "data", "commit-inflight")
    stale = os.path.join(t, "data", "commit-crashedlongago")
    for p in (young, stale):
        os.makedirs(p)
        with open(os.path.join(p, "part.parquet"), "w") as f:
            f.write("x")
    from tests.conftest import backdate_tree

    backdate_tree(stale)

    plan = vacuum(t, keep_last=1, dry_run=True)
    dirs = set(plan["dirs"])
    # v0's expired-committed dir is reclaimed regardless of age...
    assert any(d.startswith(os.path.join("data", "commit-")) for d in dirs)
    # ...the stale orphan too, but the fresh (in-flight) one is spared
    assert os.path.join("data", "commit-crashedlongago") in dirs
    assert os.path.join("data", "commit-inflight") not in dirs

    vacuum(t, keep_last=1)
    assert os.path.exists(young) and not os.path.exists(stale)
    assert _rows(spark, t) == {(2, "b")}


def test_twostar_raises_on_exhaustion_instead_of_wrong_labels(
    spark, monkeypatch
):
    """ADVICE r13 #4: exiting the large-star/small-star loop by
    exhaustion (fingerprint still moving) must raise, not silently
    return labels from a non-converged edge set; a sufficient
    max_iter on the same graph converges and matches the propagation
    operator. (r17: the driver union-find fast path solves a 40-edge
    chain exactly without iterating — force the distributed loop via
    the cap env so this still pins the LOOP's exhaustion contract.)"""
    from utility_service_areas_spark.operators import graph
    from utility_service_areas_spark.operators.graph import (
        connected_components,
        connected_components_twostar,
    )

    monkeypatch.setenv(graph._LOCAL_CC_ENV, "0")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_twostar(chain, max_iter=1)

    got = {
        (r.node, r.comp)
        for r in connected_components_twostar(chain, max_iter=30).collect()
    }
    want = {
        (r.node, r.comp) for r in connected_components(chain).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# #259 docs_quality_logreg_train: the train -> score loop (VERDICT r13
# task #7). The training plan itself is value-oracled by the driver;
# here we pin (a) the model actually LEARNED the weak label (training
# accuracy), and (b) the trained weights deploy through the
# infer_batches seam and SEPARATE the classes on scores.
# ---------------------------------------------------------------------------

from tests.conftest import SMOKE_SF  # noqa: E402


def test_logreg_learns_and_scores_through_inference_seam(spark):
    from utility_service_areas_spark.operators.inference import infer_batches
    from utility_service_areas_spark.plans.pipeline_queries import (
        _LOGREG_Y_CHARS,
        docs_quality_logreg_train,
    )
    from utility_service_areas_spark.sources.tables import load_table

    model = docs_quality_logreg_train(spark, SMOKE_SF).collect()[0]
    assert model.n_docs > 0
    # (a) the distilled rule is actually learned, not chance: the
    # measured r14 sweep gives 98.8-99.2%; pin with slack
    assert model.n_correct / model.n_docs >= 0.95
    assert 0 < model.n_pos < model.n_docs  # both classes present

    # (b) deploy the weights as a model_fn behind the batch-inference
    # seam: score = z_micros from the SAME integer features the plan
    # trained on (whitespace tokens; centered by the exported means)
    from utility_service_areas_spark.functions.textops import STOPWORDS

    w = (model.w_bias, model.w_ntok, model.w_ndist, model.w_nstop)
    mu = (model.mu_ntok, model.mu_ndist, model.mu_nstop)

    def logreg_model(texts):
        out = []
        for t in texts:
            toks = t.strip().split()
            x = (
                1,
                len(toks) - mu[0],
                len(set(toks)) - mu[1],
                sum(1 for tk in toks if tk in STOPWORDS) - mu[2],
            )
            out.append([float(sum(wi * xi for wi, xi in zip(w, x)))])
        return out

    docs = load_table(spark, SMOKE_SF, "documents")
    scored = infer_batches(docs, model_fn=logreg_model, output_dim=1)
    joined = (
        docs.select("doc_id", "n_chars")
        .join(scored.filter(F.col("status") == "ok"), "doc_id")
        .select(
            (F.col("n_chars") >= _LOGREG_Y_CHARS).alias("y"),
            F.element_at("output", 1).alias("z"),
        )
        .collect()
    )
    assert len(joined) == model.n_docs  # seam 1:1, all rows valid
    pos = [r.z for r in joined if r.y]
    neg = [r.z for r in joined if not r.y]
    acc = (
        sum(1 for z in pos if z >= 0) + sum(1 for z in neg if z < 0)
    ) / len(joined)
    assert acc >= 0.95  # the deployed model mimics the gate
    # score separation: class means sit on opposite sides with margin
    mean_pos = sum(pos) / len(pos)
    mean_neg = sum(neg) / len(neg)
    assert mean_pos > 0 > mean_neg
    assert mean_pos - mean_neg > 10 * abs(mean_pos + mean_neg)


def test_textindex_cli_lifecycle(spark, tmp_path, capsys):
    """The `textindex` CLI drives the S34 v2 lifecycle end-to-end:
    build over half the corpus -> add the other half (atomic segment)
    -> compact to one segment -> repair recount -> ranked search —
    all through main(argv), the user-facing surface."""
    from utility_service_areas_spark.__main__ import main
    from utility_service_areas_spark.operators.text_index import (
        load_bm25_index,
    )

    d = str(tmp_path / "bmidx")
    sf = SMOKE_SF
    assert main(["textindex", "build", "--sf-dir", sf, "--index-dir", d,
                 "--where", "doc_id < 250"]) == 0
    out = capsys.readouterr().out
    assert "built" in out and "1 segment(s)" in out

    assert main(["textindex", "add", "--sf-dir", sf, "--index-dir", d,
                 "--where", "doc_id >= 250"]) == 0
    out = capsys.readouterr().out
    assert "2 segment(s)" in out and "1 add batches" in out

    assert main(["textindex", "compact", "--index-dir", d]) == 0
    assert "1 segment(s)" in capsys.readouterr().out

    # retired dirs survive compaction (readers keep working) until an
    # aged vacuum; dry run reports, grace 0 sweeps
    assert main(["textindex", "vacuum", "--index-dir", d, "--dry-run",
                 "--grace-seconds", "0"]) == 0
    assert "would remove 2" in capsys.readouterr().out
    assert main(["textindex", "vacuum", "--index-dir", d,
                 "--grace-seconds", "0"]) == 0
    assert "removed 2" in capsys.readouterr().out
    assert len(os.listdir(os.path.join(d, "segments"))) == 1

    assert main(["textindex", "repair", "--index-dir", d]) == 0
    assert "recounted 1 segment(s)" in capsys.readouterr().out

    assert main(["textindex", "search", "--index-dir", d,
                 "--terms", "spark join", "--top-k", "3"]) == 0
    out = capsys.readouterr().out
    assert "q0" in out and "score_millibits" in out

    m, _p, doclens = load_bm25_index(spark, d)
    from utility_service_areas_spark.sources.tables import load_table

    assert m["n_docs"] == load_table(spark, sf, "documents").count()
    assert doclens.count() == m["n_docs"]


def test_logreg_pr_sweep_invariants(spark):
    """#260: across thresholds, tp+fn is the constant positive count;
    tp (and so recall) is monotone non-increasing as the threshold
    rises; tn is monotone non-decreasing; precision is NULL only when
    nothing is predicted positive."""
    from utility_service_areas_spark.plans.pipeline_queries import (
        docs_logreg_pr_sweep,
    )

    rows = sorted(
        docs_logreg_pr_sweep(spark, SMOKE_SF).collect(),
        key=lambda r: r.threshold,
    )
    n_pos = {r.tp + r.fn for r in rows}
    assert len(n_pos) == 1 and n_pos.pop() > 0
    tps = [r.tp for r in rows]
    assert tps == sorted(tps, reverse=True)
    tns = [r.tn for r in rows]
    assert tns == sorted(tns)
    for r in rows:
        if r.tp + r.fp == 0:
            assert r.precision_micros is None
        else:
            assert 0 <= r.precision_micros <= 1_000_000
        if r.recall_micros is not None:
            assert 0 <= r.recall_micros <= 1_000_000
    # the sweep actually SWEEPS: the extreme thresholds differ
    assert rows[0].tp > rows[-1].tp


def test_logreg_calibration_covers_and_separates(spark):
    """#261: bin counts sum to the corpus size; predicted probability
    is inside each decile's range; the top bin's empirical positive
    rate is far above the bottom bin's (the trained model's scores
    carry real signal, not just ranking noise)."""
    from utility_service_areas_spark.plans.pipeline_queries import (
        docs_logreg_calibration,
        docs_quality_logreg_train,
    )

    rows = sorted(
        docs_logreg_calibration(spark, SMOKE_SF).collect(),
        key=lambda r: r.prob_bin,
    )
    total = docs_quality_logreg_train(spark, SMOKE_SF).collect()[0].n_docs
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        lo, hi = r.prob_bin * 100_000, (r.prob_bin + 1) * 100_000
        if r.prob_bin == 9:
            hi = 1_000_000  # p = 1e6 folds into the top bin
        assert lo <= r.mean_p_micros <= hi
        assert 0 <= r.frac_pos_micros <= 1_000_000
    bottom, top = rows[0], rows[-1]
    assert bottom.prob_bin == 0 and top.prob_bin == 9
    assert top.frac_pos_micros - bottom.frac_pos_micros > 800_000
