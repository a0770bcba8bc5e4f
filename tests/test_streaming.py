"""Structured-Streaming tests: the custom stateful operator
(applyInPandasWithState) must carry group state across separate
availableNow drains sharing one checkpoint — the continuous-mode analog of
the S10 job cache."""

import pandas as pd
import pyspark.sql.functions as F

from cosmos_spark.streaming import ingest


def _write_batch(spark, src, rows):
    (spark.createDataFrame(pd.DataFrame(rows))
     .withColumn("ingested_at", F.current_timestamp())
     .write.mode("append").parquet(src))


def _drain(spark, src, ck, out):
    # parquet sink: the memory sink cannot recover from a checkpoint, and
    # checkpoint recovery is exactly what the cross-batch state test needs
    q = (ingest.stream_first_seen(spark, src).writeStream
         .outputMode("append").format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(out).toPandas()


def test_stream_first_seen_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    _write_batch(spark, src, [
        {"repo": "r1", "path": "a", "commit": "c", "lang": "py",
         "content": "X"},
        {"repo": "r1", "path": "b", "commit": "c", "lang": "py",
         "content": "X"},
        {"repo": "r2", "path": "c", "commit": "c", "lang": "py",
         "content": "Y"},
    ])
    t1 = (_drain(spark, src, ck, out)
          .groupby("repo")[["n_new", "n_dup"]].sum())
    assert (t1.loc["r1", "n_new"], t1.loc["r1", "n_dup"]) == (1, 1)
    assert t1.loc["r2", "n_new"] == 1

    # second drain, same checkpoint: X is already in r1's state -> dup;
    # Z is genuinely new. Cumulative over both emitted batches:
    _write_batch(spark, src, [
        {"repo": "r1", "path": "d", "commit": "c", "lang": "py",
         "content": "X"},
        {"repo": "r1", "path": "e", "commit": "c", "lang": "py",
         "content": "Z"},
    ])
    t2 = _drain(spark, src, ck, out)
    r1 = t2[t2["repo"] == "r1"]
    # X in batch 2 counts as DUP only because the state survived the
    # restart — a reset state would make n_new sum to 3
    assert r1["n_new"].sum() == 2          # X (batch 1) + Z (batch 2)
    assert r1["n_dup"].sum() == 2          # X dup in each batch
    assert r1["n_seen_total"].max() == 2   # {X, Z} accumulated


def test_stream_triples_match_batch(spark, tmp_path, corpus_pdf):
    """Continuous KG construction: streaming triples (availableNow drain)
    must equal the batch pipeline's stateless families on the same
    corpus, including the mentions family via the static alias dim.
    The corpus includes the multi-key collision fixture (exact
    `alpha_beta_gamma_v2` + fuzzy `alpha_beta_gamma` in one segment):
    both paths must collapse it to ONE mentions triple — batch via the
    `multi_key` agg routing, stream via the zero-state row-local
    keep-max (`_keepmax_rowlocal`)."""
    import hashlib

    from cosmos_spark import pipeline as P
    from cosmos_spark.corpus import corpus_to_spark

    src_dir = str(tmp_path / "kg_src")
    mk_content = (
        "def alpha_beta_gamma_v2(x):\n"
        "    return x\n"
        "\n"
        "def runner(y):\n"
        "    alpha_beta_gamma_v2(y)\n"
        "    alpha_beta_gamma(y)\n"
    )
    mk_row = pd.DataFrame([{
        "repo": "orgm/multikey", "path": "m.py", "commit": "c0",
        "lang": "py", "content": mk_content,
        "content_sha256": hashlib.sha256(mk_content.encode()).hexdigest(),
    }])
    pdf = pd.concat([corpus_pdf.head(40), mk_row], ignore_index=True)
    pdf["ingested_at"] = pd.Timestamp("2026-01-01")
    (spark.createDataFrame(pdf[["repo", "path", "commit", "lang",
                                "content", "ingested_at"]])
     .write.mode("overwrite").parquet(src_dir))

    batch_src = corpus_to_spark(spark, pdf.drop(columns=["ingested_at"]))
    batch = P.run_pipeline(spark, batch_src)
    aliases = batch["aliases"]

    stream = ingest.stream_triples(spark, src_dir, aliases=aliases)
    out_dir = str(tmp_path / "kg_out")
    q = (stream.writeStream.outputMode("append").format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "kg_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = spark.read.parquet(out_dir).toPandas()
    exp = (batch["triples"].filter(F.col("pred") != "same_as")
           .toPandas())
    key = lambda df: set(zip(df["subj"], df["pred"], df["obj"]))  # noqa: E731
    assert key(got) == key(exp)
    assert len(got) == len(key(got))
    ent = "ent_" + hashlib.sha256(b"ent|alpha_beta_gamma_v2").hexdigest()[:16]
    hit = got[(got["pred"] == "mentions") & (got["obj"] == ent)
              & got["subj"].str.startswith("orgm/multikey/")]
    assert len(hit) == 1 and hit["score"].iloc[0] == 1.0


def test_stream_first_seen_bloom_state_bounded(spark, tmp_path):
    """bloom_bytes mode: same counters across checkpointed drains (no
    false positives at this size), with CONSTANT state size — the bloom
    binary in the state store stays exactly bloom_bytes long however many
    hashes accumulate."""
    src = str(tmp_path / "bsrc")
    ck = str(tmp_path / "bck")
    out = str(tmp_path / "bout")

    def drain():
        q = (ingest.stream_first_seen(spark, src, bloom_bytes=256)
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(out).toPandas()

    def state_bloom_lens():
        st = (spark.read.format("statestore").load(ck).toPandas())
        return sorted(len(b) for b in st["value"].map(
            lambda v: v["groupState"]["bloom"]))

    _write_batch(spark, src, [
        {"repo": "r1", "path": "a", "commit": "c", "lang": "py",
         "content": "X"},
        {"repo": "r1", "path": "b", "commit": "c", "lang": "py",
         "content": "X"},
    ])
    t1 = drain()
    assert (t1["n_new"].sum(), t1["n_dup"].sum()) == (1, 1)
    lens1 = state_bloom_lens()

    _write_batch(spark, src, [
        {"repo": "r1", "path": "d", "commit": "c", "lang": "py",
         "content": "X"},
        {"repo": "r1", "path": "e", "commit": "c", "lang": "py",
         "content": "Z"},
        {"repo": "r1", "path": "f", "commit": "c", "lang": "py",
         "content": "W"},
    ])
    t2 = drain()
    r1 = t2[t2["repo"] == "r1"]
    assert r1["n_new"].sum() == 3          # X, Z, W
    assert r1["n_dup"].sum() == 2          # X dup in each batch
    assert r1["n_seen_total"].max() == 3
    lens2 = state_bloom_lens()
    assert lens1 == [256] and lens2 == [256]  # flat, not O(seen)


def test_stream_mention_counts_drops_late_rows(spark, tmp_path):
    """Real event-time semantics: a row whose ingested_at is older than
    the watermark must be dropped — its already-finalized window is never
    revised and no duplicate window row is appended (VERDICT r2 #4)."""
    src = str(tmp_path / "lsrc")
    ck = str(tmp_path / "lck")
    out_dir = str(tmp_path / "lout")

    def write(rows, ts):
        pdf = pd.DataFrame(rows)
        pdf["ingested_at"] = pd.Timestamp(ts)
        (spark.createDataFrame(pdf).write.mode("append").parquet(src))

    def drain():
        q = (ingest.stream_mention_counts(spark, src)
             .writeStream.outputMode("append").format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(out_dir).toPandas()

    f = {"commit": "c", "lang": "py"}
    # batch 1: two defs inside the 10:00:00 window
    write([{"repo": "r", "path": "a", "content": "def alpha():\n    return 1",
            **f},
           {"repo": "r", "path": "b", "content": "def beta():\n    return 2",
            **f}], "2026-01-01 10:00:30")
    drain()
    # batch 2: fresh row far ahead -> watermark will pass 10:01
    write([{"repo": "r", "path": "c", "content": "def gamma():\n    return 3",
            **f}], "2026-01-01 10:10:00")
    drain()
    # batch 3: one LATE def back in the finalized 10:00 window (must be
    # dropped) + one fresh row keeping the stream moving
    write([{"repo": "r", "path": "late", "content":
            "def late_fn():\n    return 9", **f}], "2026-01-01 10:00:40")
    write([{"repo": "r", "path": "d", "content": "def delta():\n    return 4",
            **f}], "2026-01-01 10:12:00")
    out = drain()

    w0 = out[(out["start"] == pd.Timestamp("2026-01-01 10:00:00"))
             & (out["mention_kind"] == "def")]
    assert len(w0) == 1                    # finalized exactly once
    assert int(w0["n_mentions"].iloc[0]) == 2   # alpha+beta, late_fn dropped


def test_stream_mention_counts_watermarked(spark, tmp_path, corpus_pdf):
    """The watermarked windowed aggregation drains under availableNow and
    produces per-kind mention counts."""
    src = str(tmp_path / "msrc")
    (spark.createDataFrame(corpus_pdf.head(20)
                           [["repo", "path", "commit", "lang", "content"]])
     .withColumn("ingested_at", F.current_timestamp())
     .write.mode("append").parquet(src))
    counts = ingest.stream_mention_counts(spark, src)
    q = (counts.writeStream.outputMode("append").format("memory")
         .queryName("wm_counts")
         .option("checkpointLocation", str(tmp_path / "mck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table("wm_counts").toPandas()
    # append mode emits only watermark-closed windows; the drain ran within
    # one window, so rows may be zero — the lifecycle (plan validity,
    # state store, trigger) is what this asserts
    assert set(out.columns) == {"start", "end", "mention_kind", "n_mentions"}


def test_keepmax_rowlocal_carry_across_arrow_batches(spark):
    """_keepmax_rowlocal must stay exact when a subj run straddles Arrow
    batch boundaries: force 2-row batches so every contiguous run is
    split, and verify keep-max dedup against a pandas oracle. Also checks
    the no-duplicate case passes through untouched."""
    rows = []
    # three contiguous subj runs in one partition, each with an
    # intra-run duplicate at differing scores + distinct objs
    for s in ("s1", "s2", "s3"):
        rows += [
            {"subj": s, "pred": "mentions", "obj": "eA", "repo": "r",
             "score": 0.85},
            {"subj": s, "pred": "mentions", "obj": "eA", "repo": "r",
             "score": 1.0},
            {"subj": s, "pred": "mentions", "obj": "eB", "repo": "r",
             "score": 0.9},
        ]
    pdf = pd.DataFrame(rows)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        df = spark.createDataFrame(pdf).coalesce(1)
        got = (ingest._keepmax_rowlocal(df).toPandas()
               .sort_values(["subj", "obj"]).reset_index(drop=True))
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)
    exp = (pdf.sort_values("score", ascending=False)
           .drop_duplicates(["subj", "obj"])
           .sort_values(["subj", "obj"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()])
    assert len(got) == 6 and (got.groupby("subj").size() == 2).all()
    assert (got[got["obj"] == "eA"]["score"] == 1.0).all()


def test_stream_triples_catalog_sink_exactly_once(spark, tmp_path,
                                                  corpus_pdf):
    """foreachBatch + epoch-tagged atomic snapshots = exactly-once graph
    ingestion: batches commit once, a replayed epoch is a no-op, and new
    source files land as exactly one new snapshot per batch."""
    from cosmos_spark.sources import Catalog
    from cosmos_spark.streaming.ingest import (_commit_epoch, _last_epoch,
                                               stream_triples_to_catalog)

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    cat = Catalog(spark, str(tmp_path / "wh"))

    pdf = corpus_pdf.head(20).copy()
    pdf["ingested_at"] = pd.Timestamp("2026-01-01")
    cols = ["repo", "path", "commit", "lang", "content", "ingested_at"]
    (spark.createDataFrame(pdf[cols]).write.mode("append").parquet(src))

    stream_triples_to_catalog(ingest.stream_triples(spark, src), ck,
                              cat, "g.triples")
    n1 = cat.read_at("g.triples").count()
    snaps1 = [s["id"] for s in cat.snapshots("g.triples")]
    assert n1 > 0 and len(snaps1) >= 1
    assert _last_epoch(cat, "g.triples") >= 0

    # a replayed epoch (crash between sink and checkpoint commit) is a
    # no-op: same count, no new snapshot
    some_rows = cat.read_at("g.triples").limit(3)
    assert _commit_epoch(cat, "g.triples", some_rows,
                         _last_epoch(cat, "g.triples")) is False
    assert cat.read_at("g.triples").count() == n1
    assert [s["id"] for s in cat.snapshots("g.triples")] == snaps1

    # draining again with no new input adds nothing
    stream_triples_to_catalog(ingest.stream_triples(spark, src), ck,
                              cat, "g.triples")
    assert cat.read_at("g.triples").count() == n1

    # new files -> exactly one more epoch-tagged snapshot, only new rows
    pdf2 = corpus_pdf.iloc[20:30].copy()
    pdf2["ingested_at"] = pd.Timestamp("2026-01-02")
    (spark.createDataFrame(pdf2[cols]).write.mode("append").parquet(src))
    stream_triples_to_catalog(ingest.stream_triples(spark, src), ck,
                              cat, "g.triples")
    snaps2 = cat.snapshots("g.triples")
    assert len(snaps2) == len(snaps1) + 1
    assert snaps2[-1]["epoch"] > snaps2[-2]["epoch"]
    assert cat.read_at("g.triples").count() > n1
    # incremental consumers see exactly the new batch
    assert (cat.changes("g.triples", since=snaps1[-1]).count()
            == cat.read_at("g.triples").count() - n1)


def test_stream_stream_join_matches_and_redrains_idempotently(
        spark, tmp_path):
    """stream_mention_joins: call sites resolve to definitions of the
    same (repo, name) within the event-time lag; a second checkpointed
    drain with no new data emits nothing (join state + offsets are in
    the checkpoint, not recomputed)."""
    import pandas as pd

    rows = []
    for i, (repo, lag_min) in enumerate(
            [("r1", 0), ("r1", 2), ("r1", 3), ("r2", 1)]):
        name = "fn%d" % i
        t0 = pd.Timestamp("2026-01-01 00:00:00")
        rows.append({"repo": repo, "path": "d%d.py" % i, "commit": "0" * 40,
                     "lang": "python",
                     "content": "def %s(x):\n    return x\n" % name,
                     "ingested_at": t0})
        rows.append({"repo": repo, "path": "c%d.py" % i, "commit": "0" * 40,
                     "lang": "python",
                     "content": "def use%d(y):\n    return %s(y)\n"
                                % (i, name),
                     "ingested_at": t0 + pd.Timedelta(minutes=lag_min)})
    pdf = pd.DataFrame(rows)
    defs_dir, calls_dir = str(tmp_path / "defs"), str(tmp_path / "calls")
    spark.createDataFrame(pdf[pdf.path.str.startswith("d")]).write.parquet(
        defs_dir)
    spark.createDataFrame(pdf[pdf.path.str.startswith("c")]).write.parquet(
        calls_dir)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (ingest.stream_mention_joins(spark, defs_dir, calls_dir,
                                         lag_minutes=2)
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    got = {(r["repo"], r["name"]) for r in drain()}
    # fn2's call arrives 3 min after its def: outside the ±2 min lag
    assert got == {("r1", "fn0"), ("r1", "fn1"), ("r2", "fn3")}
    assert len(drain()) == 3  # re-drain adds nothing


def test_session_window_inclusive_gap_boundary(spark):
    """Pin the merge rule stream_sessions (and its oracle's
    `<= INTERVAL 5 MINUTE`) depends on: an event exactly `gap` after
    the last one still EXTENDS the session (inclusive boundary); only
    a strictly larger quiet period splits. Batch session_window shares
    the streaming implementation's assignment logic."""
    rows = [("r", "2026-01-01 10:00:00"),
            ("r", "2026-01-01 10:05:00"),   # exactly +5 min -> merges
            ("r", "2026-01-01 10:11:00")]   # +6 min -> new session
    df = spark.createDataFrame(rows, "repo string, t string").select(
        "repo", F.to_timestamp("t").alias("ingested_at"))
    out = (df.groupBy("repo",
                      F.session_window("ingested_at", "5 minutes")
                      .alias("s"))
           .agg(F.count(F.lit(1)).alias("n"))
           .select(F.col("s.start").cast("string").alias("start"),
                   F.col("s.end").cast("string").alias("end"), "n")
           .orderBy("start").collect())
    assert [(r["start"], r["end"], r["n"]) for r in out] == [
        ("2026-01-01 10:00:00", "2026-01-01 10:10:00", 2),
        ("2026-01-01 10:11:00", "2026-01-01 10:16:00", 1)]


def test_stream_sessions_emits_only_finalized(spark, tmp_path):
    """Append-mode sessions emit only after the watermark passes their
    end, one drain after the watermark-advancing batch; a re-drain with
    no new data adds nothing."""
    from cosmos_spark.streaming import ingest
    src, ck, out = (str(tmp_path / d) for d in ("ssrc", "sck", "sout"))

    def write(repo, ts):
        pdf = pd.DataFrame([{"repo": repo, "path": "p", "commit": "c",
                             "lang": "md", "content": ""}])
        pdf["ingested_at"] = pd.Timestamp(ts)
        spark.createDataFrame(pdf).write.mode("append").parquet(src)

    def drain():
        q = (ingest.stream_sessions(spark, src, gap="5 minutes",
                                    watermark="1 minutes")
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(out).toPandas()

    write("r", "2026-01-01 10:00:00")
    assert len(drain()) == 0            # watermark still at epoch
    write("r", "2026-01-01 11:00:00")   # advances watermark past 10:05
    drain()
    got = drain()                       # finalization lands a drain later
    sess = got[got["session_start"] == pd.Timestamp("2026-01-01 10:00:00")]
    assert len(sess) == 1 and int(sess["n_events"].iloc[0]) == 1
    assert len(drain()) == len(got)     # idempotent re-drain


def test_epoch_watermark_survives_compaction(spark, tmp_path):
    """Review fix: compaction + expire used to erase the epoch-tagged
    append entries, so a replayed micro-batch (the sink-ran /
    checkpoint-didn't crash window) would append TWICE after a
    compaction. The overwrite snapshot now inherits max(epoch)."""
    from cosmos_spark.sources import Catalog
    from cosmos_spark.streaming.ingest import _commit_epoch, _last_epoch

    cat = Catalog(spark, str(tmp_path / "wh"))
    rows = spark.createDataFrame(
        [("s", "defines", "o", "r", 1.0)],
        "subj string, pred string, obj string, repo string, score double")
    assert _commit_epoch(cat, "g.triples", rows, 0) is True
    assert _commit_epoch(cat, "g.triples", rows, 1) is True
    n = cat.read_at("g.triples").count()

    cat.compact("g.triples")
    cat.expire_snapshots("g.triples", keep_last=1)
    assert _last_epoch(cat, "g.triples") == 1
    # crash-window replay of epoch 1 is STILL a no-op post-compaction
    assert _commit_epoch(cat, "g.triples", rows, 1) is False
    assert cat.read_at("g.triples").count() == n


def test_stream_dedup_suppresses_then_expires(spark, tmp_path):
    """dropDuplicatesWithinWatermark contract: duplicates inside the
    watermark window are suppressed ACROSS drains (state carried through
    the checkpoint), and a re-delivery arriving after the key's state
    expired (watermark passed event_time + delay) is re-emitted — the
    bounded-state trade documented on stream_dedup."""
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def _row(path, minute):
        return {"repo": "r", "path": path, "commit": "0" * 40,
                "lang": "py", "content": "",
                "ingested_at": pd.Timestamp("2026-01-01") +
                pd.Timedelta(minutes=minute)}

    def _write(rows):
        (spark.createDataFrame(pd.DataFrame(rows))
         .write.mode("append").parquet(src))

    def _drain():
        q = (ingest.stream_dedup(spark, src, watermark="10 minutes")
             .select("repo", "path")
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(out).toPandas()

    # batch 1: key twice in one batch -> one emission
    _write([_row("p", 0), _row("p", 1)])
    got = _drain()
    assert len(got[got["path"] == "p"]) == 1
    # batch 2: same key again, still inside the watermark -> suppressed
    # by state carried across the checkpoint; flush row advances the
    # watermark far past the key's expiry (60 - 10 > 0 + 10)
    _write([_row("p", 2), _row("flush", 60)])
    got = _drain()
    assert len(got[got["path"] == "p"]) == 1
    # batch 3: re-delivery after expiry (event time 55 > watermark 50,
    # so not late; state for "p" is gone) -> re-emitted
    _write([_row("p", 55)])
    got = _drain()
    assert len(got[got["path"] == "p"]) == 2


def test_first_seen_rejects_nonpositive_bloom(spark, tmp_path_factory):
    """bloom_bytes <= 0 must fail fast on the driver, not
    ZeroDivisionError inside the executor on the first probe."""
    import pytest as _pytest
    from cosmos_spark.streaming.ingest import stream_first_seen
    d = str(tmp_path_factory.mktemp("src_bloom"))
    for bad in (0, -1):
        with _pytest.raises(ValueError, match="bloom_bytes"):
            stream_first_seen(spark, d, bloom_bytes=bad)
