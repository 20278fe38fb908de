"""E2E CLI run with the operational logging layer: every phase must
leave log lines (stdout+file), matching the reference's shared logger
wired through each phase (`src/common/logging_utils.py:7-33`)."""

from __future__ import annotations

import datetime as dt
import json
import logging
import pytest

# r13: CLI end-to-end battery is exhaustive-marked (~70s; run_suite chunk B runs it)
pytestmark = pytest.mark.exhaustive


def _reset_loggers():
    for name in ("reddit_hn_etl_spark", "reddit_hn_etl_spark.audit"):
        lg = logging.getLogger(name)
        for h in list(lg.handlers):
            lg.removeHandler(h)
            h.close()


def test_cli_run_emits_phase_logs(spark, tmp_path, monkeypatch):
    from reddit_hn_etl_spark.__main__ import main

    monkeypatch.setenv("SPARK_ETL_LOG_DIR", str(tmp_path / "logs"))
    _reset_loggers()

    raw = tmp_path / "raw"
    raw.mkdir()
    ts = dt.datetime(2024, 1, 16, 1, 0, 0)
    recs = [
        {"id": 1, "type": "story", "by": "a", "time": 1705276800,
         "title": "t1", "url": "https://example.com/x", "score": 3},
        {"id": 2, "type": "story", "by": "b", "time": 1705276860,
         "title": "t2"},
    ]
    (raw / f"hn_raw_{ts.strftime('%Y%m%d_%H%M%S')}.json").write_text(
        json.dumps(recs), encoding="utf-8"
    )
    out = tmp_path / "wh"

    try:
        rc = main(["--raw-dir", str(raw), "--out", str(out)])
    finally:
        log_text = (tmp_path / "logs" / "pipeline.log").read_text(
            encoding="utf-8"
        )
        _reset_loggers()  # don't leak tmp_path handlers to other tests

    assert rc == 0
    # One line per phase transition, reference-style format.
    for needle in (
        "phase=load run_id=",
        "status=success",
        "phase=staging_publish",
        "phase=mart",
        "load hn_raw_20240116_010000.json: rows=2",
        "marts published: version=",
    ):
        assert needle in log_text, f"missing log line: {needle}"
    assert "| ERROR |" not in log_text


def test_env_file_loading(tmp_path, monkeypatch):
    """Reference load_dotenv parity (`src/mart/hn_mart.py:33`): file
    values land in the environment, real env always wins, a missing
    file is a silent no-op, and quoting/comments parse like dotenv."""
    from reddit_hn_etl_spark.config import load_env_file

    envf = tmp_path / ".env"
    envf.write_text(
        "# engine tunables\n"
        "export SPARK_GRAFT_SHUFFLE_PARTITIONS=16\n"
        "SPARK_GRAFT_DRIVER_MEM='4g'\n"
        "SPARK_GRAFT_CPUS=8\n"
    )
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "2")  # pre-existing env wins
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)

    parsed = load_env_file(str(envf))
    import os

    assert parsed["SPARK_GRAFT_SHUFFLE_PARTITIONS"] == "16"
    assert os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] == "16"
    assert os.environ["SPARK_GRAFT_DRIVER_MEM"] == "4g"  # quotes stripped
    assert os.environ["SPARK_GRAFT_CPUS"] == "2"

    assert load_env_file(str(tmp_path / "missing.env")) == {}


def test_cli_curate_docs_publishes_and_logs(spark, tmp_path, monkeypatch):
    from reddit_hn_etl_spark.__main__ import main

    monkeypatch.setenv("SPARK_ETL_LOG_DIR", str(tmp_path / "logs"))
    _reset_loggers()
    out = tmp_path / "wh"

    try:
        rc = main([
            "--curate-docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out), "--keep-policy", "best_quality",
        ])
    finally:
        log_text = (tmp_path / "logs" / "pipeline.log").read_text(
            encoding="utf-8"
        )
        _reset_loggers()

    assert rc == 0
    assert "phase=curate run_id=" in log_text
    assert "status=success" in log_text
    assert "policy=best_quality" in log_text
    assert "| ERROR |" not in log_text

    # atomic publish: versioned pointer + the three tables readable
    from reddit_hn_etl_spark.sources.publish import read_published

    root = str(out / "curated")
    kept = read_published(spark, root, "curated_docs")
    fate = read_published(spark, root, "curation_fate")
    stats = read_published(spark, root, "corpus_stats")
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert fate.count() == n_docs  # every original doc has a fate
    assert 0 < kept.count() <= n_docs
    row = stats.collect()[0]
    assert row.n_docs == kept.count() and row.total_tokens_bpe > 0
    # audit table recorded the run
    audit = spark.read.parquet(str(out / "audit_runs"))
    assert audit.where("phase = 'curate' AND status = 'success'").count() == 1


def test_cli_compact_rewrites_and_logs(spark, tmp_path, monkeypatch):
    from reddit_hn_etl_spark.__main__ import main

    monkeypatch.setenv("SPARK_ETL_LOG_DIR", str(tmp_path / "logs"))
    _reset_loggers()
    table = str(tmp_path / "frag")
    # 2 dates × 5 tiny appends
    for i in range(5):
        rows = [(d * 100 + i * 10 + k, f"2024-02-0{d}", float(i))
                for d in (1, 2) for k in range(10)]
        (
            spark.createDataFrame(rows, "id long, event_date string, v double")
            .repartition(2)
            .write.mode("append").partitionBy("event_date").parquet(table)
        )
    before = sorted(
        (r.id, str(r.event_date), r.v)
        for r in spark.read.parquet(table).collect()
    )

    try:
        rc = main([
            "--compact", table, "--out", str(tmp_path / "wh"),
            "--compact-rows-per-file", "40",
        ])
    finally:
        log_text = (tmp_path / "logs" / "pipeline.log").read_text(
            encoding="utf-8"
        )
        _reset_loggers()

    assert rc == 0
    assert "phase=compact run_id=" in log_text
    assert "status=success" in log_text
    assert "2 partitions rewritten" in log_text

    import glob
    import os

    after = sorted(
        (r.id, str(r.event_date), r.v)
        for r in spark.read.parquet(table).collect()
    )
    assert after == before
    for p in glob.glob(os.path.join(table, "event_date=*")):
        assert len(glob.glob(os.path.join(p, "*.parquet"))) <= 2


def test_cli_export_corpus_shards_and_manifest(spark, tmp_path, monkeypatch):
    from reddit_hn_etl_spark.__main__ import main

    monkeypatch.setenv("SPARK_ETL_LOG_DIR", str(tmp_path / "logs"))
    _reset_loggers()
    out = tmp_path / "wh"

    try:
        rc = main([
            "--export-corpus", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out), "--tokens-per-shard", "5000",
        ])
    finally:
        log_text = (tmp_path / "logs" / "pipeline.log").read_text(
            encoding="utf-8"
        )
        _reset_loggers()

    assert rc == 0
    assert "phase=export run_id=" in log_text
    assert "status=success" in log_text

    from reddit_hn_etl_spark.sources.publish import read_published

    root = str(out / "export")
    shards = read_published(spark, root, "shards")
    manifest = read_published(spark, root, "shard_manifest")

    # every curated doc exactly once, both splits populated
    ids = [r.doc_id for r in shards.select("doc_id").collect()]
    assert len(ids) == len(set(ids)) > 0
    assert {r.split for r in shards.select("split").distinct().collect()} == {
        "train", "val",
    }
    # manifest is the groupBy of shards, and every shard respects the
    # token budget modulo its last (boundary-straddling) document
    m = {(r.split, r.shard_id): (r.n_docs, r.n_tokens) for r in manifest.collect()}
    agg = {}
    for r in shards.select("split", "shard_id", "n_tokens_bpe").collect():
        d, t = agg.get((r.split, r.shard_id), (0, 0))
        agg[(r.split, r.shard_id)] = (d + 1, t + r.n_tokens_bpe)
    assert m == agg
    max_doc = max(t for _, t in (
        (r.doc_id, r.n_tokens_bpe)
        for r in shards.select("doc_id", "n_tokens_bpe").collect()
    ))
    for (_split, _sid), (_d, tok) in m.items():
        assert tok <= 5000 + max_doc


def test_cli_cluster_embeddings_publishes_and_logs(spark, tmp_path, monkeypatch):
    from reddit_hn_etl_spark.__main__ import main

    monkeypatch.setenv("SPARK_ETL_LOG_DIR", str(tmp_path / "logs"))
    _reset_loggers()
    out = tmp_path / "wh"

    try:
        rc = main([
            "--cluster-embeddings", "/root/testdata/sf0.001/embeddings.parquet",
            "--out", str(out), "--kmeans-k", "6", "--kmeans-iters", "2",
        ])
    finally:
        log_text = (tmp_path / "logs" / "pipeline.log").read_text(
            encoding="utf-8"
        )
        _reset_loggers()

    assert rc == 0
    assert "phase=cluster run_id=" in log_text
    assert "status=success" in log_text
    assert "k=6 iters=2 inertia=" in log_text
    assert "| ERROR |" not in log_text

    from reddit_hn_etl_spark.sources.publish import read_published

    root = str(out / "clusters")
    assigned = read_published(spark, root, "cluster_assignments")
    protos = read_published(spark, root, "cluster_prototypes")
    cents = read_published(spark, root, "cluster_centroids")
    n = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert assigned.count() == n  # every vector assigned
    assert cents.count() == 6
    # prototypes: one per non-empty cluster, each a real member
    pc = protos.count()
    assert 0 < pc <= 6
    joined = protos.join(assigned, ["cluster_id", "vec_id", "dist_sq"])
    assert joined.count() == pc
    audit = spark.read.parquet(str(out / "audit_runs"))
    assert audit.where("phase = 'cluster' AND status = 'success'").count() == 1


def test_cli_pca_embeddings_publishes_and_logs(spark, tmp_path, monkeypatch):
    import numpy as np

    from reddit_hn_etl_spark.__main__ import main

    monkeypatch.setenv("SPARK_ETL_LOG_DIR", str(tmp_path / "logs"))
    _reset_loggers()
    out = tmp_path / "wh"

    try:
        rc = main([
            "--pca-embeddings", "/root/testdata/sf0.001/embeddings.parquet",
            "--out", str(out),
        ])
    finally:
        log_text = (tmp_path / "logs" / "pipeline.log").read_text(
            encoding="utf-8"
        )
        _reset_loggers()

    assert rc == 0
    assert "phase=pca run_id=" in log_text
    assert "status=success" in log_text
    assert "dim=64" in log_text
    assert "| ERROR |" not in log_text

    from reddit_hn_etl_spark.sources.publish import read_published

    root = str(out / "pca")
    proj = read_published(spark, root, "pca_projections")
    c1 = read_published(spark, root, "pca_component1")
    c2 = read_published(spark, root, "pca_component2")
    cov = read_published(spark, root, "pca_covariance")
    n = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert proj.count() == n
    assert c1.count() == 64 and c2.count() == 64
    assert cov.count() == 64 * 65 // 2
    # components are unit vectors; projections have nonzero spread
    l1 = np.array([r["loading"] for r in c1.collect()])
    assert abs(float(l1 @ l1) - 1.0) < 1e-6
    scores = [r["pc1"] for r in proj.collect()]
    assert max(scores) > min(scores)
    audit = spark.read.parquet(str(out / "audit_runs"))
    assert audit.where("phase = 'pca' AND status = 'success'").count() == 1
