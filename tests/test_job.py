"""End-to-end job wiring (the spark-submit entry point, in-process)."""

import os

import pytest

from pyspark.sql import functions as F


def test_job_main_synthesize_no_link(spark, tmp_path):
    from openue_spark.job import main

    out = str(tmp_path / "kg")
    rc = main(["--synthesize", "2000", "--out", out, "--no-link", "--shards", "2"], spark=spark)
    assert rc == 0
    graph = spark.read.parquet(f"{out}/graph")
    assert graph.count() > 0
    assert {"subj", "pred", "obj", "support", "conv_bucket"} <= set(graph.columns)
    # manifest lineage rows: one per (run, shard), plus stage metric rows
    manifest = spark.read.parquet(f"{out}/manifest")
    assert manifest.where(F.col("stage") == "extract").count() == 2
    assert manifest.where(F.col("triple_count") <= 0).count() == 0
    # the graph stage logs its latency + canonical count to the same table
    # (north rule: lineage AND latency metrics in one manifest); --no-link
    # skips the link stage, so exactly one stage row exists
    g = manifest.where(F.col("stage") == "graph").collect()
    assert len(g) == 1 and g[0].shard == -1 and g[0].wall_ms > 0
    assert g[0].triple_count == graph.count()
    assert manifest.where(F.col("stage") == "link").count() == 0
    # hive layout on disk
    preds = [d for d in os.listdir(f"{out}/graph") if d.startswith("pred=")]
    assert len(preds) > 1


@pytest.mark.slow
def test_job_main_input_path_resumes(spark, tmp_path):
    """Re-running over the same --out is a no-op resume (manifest-driven)."""
    from openue_spark.fixtures import transcripts_spark
    from openue_spark.job import main

    inp = str(tmp_path / "turns")
    transcripts_spark(spark, 1500, partitions=2).write.parquet(inp)
    out = str(tmp_path / "kg2")
    assert main(["--input", inp, "--out", out, "--no-link", "--shards", "2"], spark=spark) == 0
    n1 = spark.read.parquet(f"{out}/triples").count()

    def extract_rows():
        return (
            spark.read.parquet(f"{out}/manifest")
            .where(F.col("stage") == "extract")
            .count()
        )

    m1 = extract_rows()
    assert main(["--input", inp, "--out", out, "--no-link", "--shards", "2"], spark=spark) == 0
    assert spark.read.parquet(f"{out}/triples").count() == n1
    assert extract_rows() == m1  # no shard re-extracted
    # stage metric rows DO append per run (each run logs its own latency)
    assert (
        spark.read.parquet(f"{out}/manifest").where(F.col("stage") == "graph").count()
        == 2
    )


@pytest.mark.slow
def test_job_incremental_fold_equals_full_run(spark, tmp_path):
    """Full run over [0, 3000) + --increment fold of [3000, 4500) must yield
    the SAME graph table (rows, support counts, provenance) as one full run
    over [0, 4500) — in the max-bucket=none exactness regime."""
    from openue_spark.job import main

    def graph_rows(out):
        return {
            tuple(r)
            for r in spark.read.parquet(f"{out}/graph")
            .select("subj", "pred", "obj", "support", "first_conv")
            .collect()
        }

    out_inc = str(tmp_path / "kg_inc")
    base = ["--shards", "2", "--max-bucket", "none"]
    assert main(["--synthesize", "3000", "--out", out_inc] + base, spark=spark) == 0
    assert (
        main(
            ["--synthesize", "1500", "--synthesize-offset", "3000",
             "--increment", "--out", out_inc] + base,
            spark=spark,
        )
        == 0
    )
    out_full = str(tmp_path / "kg_full")
    assert main(["--synthesize", "4500", "--out", out_full] + base, spark=spark) == 0

    assert graph_rows(out_inc) == graph_rows(out_full)
    # the folded mapping equals the full run's mapping too
    m_inc = {
        (r.mention, r.canonical)
        for r in spark.read.parquet(f"{out_inc}/mapping").collect()
    }
    m_full = {
        (r.mention, r.canonical)
        for r in spark.read.parquet(f"{out_full}/mapping").collect()
    }
    assert m_inc == m_full


def test_job_increment_refreshes_graph_stats(spark, tmp_path):
    """--graph-stats on an --increment run recomputes the census + hub
    report over the FOLDED graph (the early-return path used to skip it)."""
    from openue_spark.job import main
    from openue_spark.ops.graph import triangle_stats

    out = str(tmp_path / "kg_inc_gs")
    base = ["--shards", "2", "--max-bucket", "none", "--graph-stats"]
    assert main(["--synthesize", "2500", "--out", out] + base, spark=spark) == 0
    before = spark.read.parquet(f"{out}/graph_stats").collect()[0]
    assert (
        main(["--synthesize", "1500", "--synthesize-offset", "2500",
              "--increment", "--out", out] + base, spark=spark)
        == 0
    )
    after = spark.read.parquet(f"{out}/graph_stats").collect()[0]
    edges = spark.read.parquet(f"{out}/graph").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    assert after.asDict() == triangle_stats(edges).collect()[0].asDict()
    assert after.n_edges > before.n_edges  # the fold grew the graph
    assert spark.read.parquet(f"{out}/graph_hubs").count() > 0
    m = spark.read.parquet(f"{out}/manifest").where(
        F.col("stage") == "graph-hubs"
    ).count()
    assert m == 2  # one per run


def test_job_corpus_stats_phase(spark, tmp_path):
    """--corpus-stats writes the transcript rollups over THIS RUN's input
    (post-sampling), equal to calling the ops directly, and logs the
    phase to the manifest."""
    from openue_spark.fixtures import transcripts_spark
    from openue_spark.job import main
    from openue_spark.ops.sampling import deterministic_sample
    from openue_spark.ops.transcripts import conversation_stats, tool_usage

    out = str(tmp_path / "kg_cs")
    assert (
        main(
            ["--synthesize", "2000", "--out", out, "--shards", "2",
             "--no-link", "--corpus-stats", "--sample-fraction", "0.5"],
            spark=spark,
        )
        == 0
    )
    sampled = deterministic_sample(
        transcripts_spark(spark, 2000), 0.5, "conv_id", salt="corpus-sample"
    )
    got_cs = {
        r.conv_id: r.asDict()
        for r in spark.read.parquet(f"{out}/corpus_stats").collect()
    }
    exp_cs = {
        r.conv_id: r.asDict() for r in conversation_stats(sampled).collect()
    }
    assert got_cs == exp_cs
    got_tools = {
        r.tool: (r.n_calls, r.n_convs)
        for r in spark.read.parquet(f"{out}/tool_usage").collect()
    }
    exp_tools = {
        r.tool: (r.n_calls, r.n_convs) for r in tool_usage(sampled).collect()
    }
    assert got_tools == exp_tools and got_tools
    m = spark.read.parquet(f"{out}/manifest").where(
        F.col("stage") == "corpus-stats"
    ).collect()
    assert len(m) == 1 and m[0].row_count == len(exp_cs)


def test_job_increment_requires_prior_linked_run(spark, tmp_path):
    import pytest

    from openue_spark.job import main

    out = str(tmp_path / "empty_kg")
    with pytest.raises(SystemExit):
        main(
            ["--synthesize", "500", "--increment", "--out", out, "--shards", "2"],
            spark=spark,
        )


def test_job_subword_tokenizer_flag(spark, tmp_path):
    """--subword-piece-len runs the whole job on the injected tokenizer:
    the graph's mention vocabulary is piece-shaped (##-continuations
    present) and the extraction equals a direct seam extraction."""
    from openue_spark.job import main
    from openue_spark.pipeline import extract_triples
    from openue_spark.fixtures import transcripts_spark
    from openue_spark.tokenizer import SubwordTokenizer

    out = str(tmp_path / "kg_sub")
    rc = main(
        ["--synthesize", "1500", "--out", out, "--no-link", "--shards", "2",
         "--subword-piece-len", "3"],
        spark=spark,
    )
    assert rc == 0
    triples = spark.read.parquet(f"{out}/triples")
    bc = spark.sparkContext.broadcast(SubwordTokenizer(3))
    expect = extract_triples(transcripts_spark(spark, 1500), tokenizer_bc=bc)
    key = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    assert sorted(map(tuple, triples.select(key).collect())) == sorted(
        map(tuple, expect.select(key).collect())
    )
    # piece-shaped surface forms made it into the graph vocabulary
    graph = spark.read.parquet(f"{out}/graph")
    assert graph.where(F.col("subj").contains("##") | F.col("obj").contains("##")).count() > 0


@pytest.mark.slow
def test_profile_job_smoke(tmp_path):
    """scripts/profile_job.py runs a tiny full job with the event log on,
    parses it, and rolls the per-job table up by job_phase labels — pin
    that the harness works end-to-end (subprocess + zstd log + rollup) and
    that the known phase labels appear, so the PLANS.md §19 protocol
    doesn't rot."""
    import subprocess
    import sys

    evdir = str(tmp_path / "spark-events")
    proc = subprocess.run(
        [sys.executable, "scripts/profile_job.py", "--turns", "20000",
         "--cores", "4", "--evdir", evdir],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "app wall" in out and "serial-ish total" in out
    for phase in ("extract", "verify+cc", "canonicalize", "graph-write"):
        assert phase in out, f"phase label {phase!r} missing from rollup:\n{out[-2000:]}"


def test_job_sample_fraction_is_stable_conversation_subset(spark, tmp_path):
    """--sample-fraction extracts exactly the raw triples of the kept
    conversations: the sampled run's triples == the full run's triples
    filtered to the deterministic conv_id subset (whole conversations,
    same subset every run)."""
    from openue_spark.fixtures import transcripts_spark
    from openue_spark.job import main
    from openue_spark.ops.sampling import deterministic_sample

    full_out = str(tmp_path / "kg_full")
    samp_out = str(tmp_path / "kg_samp")
    assert main(["--synthesize", "2000", "--out", full_out, "--no-link",
                 "--shards", "2"], spark=spark) == 0
    assert main(["--synthesize", "2000", "--out", samp_out, "--no-link",
                 "--shards", "2", "--sample-fraction", "0.4"], spark=spark) == 0
    kept = {
        r.conv_id
        for r in deterministic_sample(
            transcripts_spark(spark, 2000), 0.4, "conv_id",
            salt="corpus-sample",
        ).select("conv_id").distinct().collect()
    }
    cols = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    full = spark.read.parquet(f"{full_out}/triples")
    samp = spark.read.parquet(f"{samp_out}/triples")
    expect = sorted(
        tuple(r) for r in full.where(F.col("conv_id").isin(kept)).select(*cols).collect()
    )
    got = sorted(tuple(r) for r in samp.select(*cols).collect())
    assert got == expect and 0 < len(got) < full.count()


def test_job_graph_stats_flag(spark, tmp_path):
    """--graph-stats appends a triangle-census phase: one-row parquet at
    graph_stats/ that equals a direct triangle_stats over the materialized
    graph, plus a manifest latency row."""
    from openue_spark.job import main
    from openue_spark.ops.graph import triangle_stats

    out = str(tmp_path / "kg_gs")
    rc = main(
        ["--synthesize", "2000", "--out", out, "--no-link", "--shards", "2",
         "--graph-stats"],
        spark=spark,
    )
    assert rc == 0
    got = spark.read.parquet(f"{out}/graph_stats").collect()
    assert len(got) == 1
    edges = spark.read.parquet(f"{out}/graph").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    expect = triangle_stats(edges).collect()[0]
    assert got[0].asDict() == expect.asDict()
    assert got[0].n_edges > 0
    m = spark.read.parquet(f"{out}/manifest").where(
        F.col("stage") == "graph-stats"
    ).collect()
    assert len(m) == 1 and m[0].wall_ms > 0
    assert m[0].row_count == got[0].n_triangles
    # the same flag also writes the PageRank hub report: top-100 by
    # (rank desc, node) of the auto-scaled 3-round integer PageRank
    from openue_spark.ops.graph import pagerank_int

    hubs = spark.read.parquet(f"{out}/graph_hubs").collect()
    full = pagerank_int(
        edges, iterations=3, scale=None, node_count=got[0].n_nodes
    ).collect()
    expect_hubs = sorted(full, key=lambda r: (-r.rank, r.node))[: len(hubs)]
    assert sorted(hubs, key=lambda r: (-r.rank, r.node)) == expect_hubs
    assert 0 < len(hubs) <= 100
    mh = spark.read.parquet(f"{out}/manifest").where(
        F.col("stage") == "graph-hubs"
    ).collect()
    assert len(mh) == 1 and mh[0].row_count == len(hubs)
