"""cosmos_corpus Python DataSource: batch/stream parity with the
corpus generator, partition planning, and checkpointed stream resume."""

import tempfile

import pytest

from cosmos_spark.corpus import make_corpus
from cosmos_spark.sources.corpus_source import CorpusDataSource

OPTS = dict(n_repos="3", files_per_repo="5", skew_factor="2", seed="42")


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(CorpusDataSource)
    return spark


def _expected():
    pdf = make_corpus(n_repos=3, files_per_repo=5, skew_factor=2, seed=42)
    cols = ["repo", "path", "commit", "lang", "content", "content_sha256"]
    return sorted(map(tuple, pdf[cols].itertuples(index=False)))


def test_batch_read_matches_generator_and_plans_partitions(registered):
    df = (registered.read.format("cosmos_corpus")
          .options(**OPTS, num_partitions="4").load())
    assert df.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, df.collect())) == _expected()


def test_batch_partitioning_does_not_change_rows(registered):
    one = (registered.read.format("cosmos_corpus")
           .options(**OPTS, num_partitions="1").load())
    many = (registered.read.format("cosmos_corpus")
            .options(**OPTS, num_partitions="7").load())
    assert (sorted(map(tuple, one.collect()))
            == sorted(map(tuple, many.collect())))


def test_stream_drains_in_batches_and_resumes_from_checkpoint(registered):
    """Each availableNow run drains one rows_per_batch step (the Python
    stream API has no admission control, so `latestOffset` advances per
    call); re-starting against the same checkpoint resumes mid-corpus —
    which is exactly the offset-checkpointing contract."""
    spark = registered
    exp = _expected()
    ck = tempfile.mkdtemp(prefix="corpus_src_ck_")
    out = tempfile.mkdtemp(prefix="corpus_src_out_")
    drains, n = 0, 0
    while n < len(exp):
        s = (spark.readStream.format("cosmos_corpus")
             .options(**OPTS, rows_per_batch="7", num_partitions="2")
             .load())
        q = (s.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        n = spark.read.parquet(out).count()
        drains += 1
        assert drains <= 10, "stream failed to make progress"
    assert drains > 1  # genuinely micro-batched, not one big read
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == exp


def test_stream_composes_with_batch_kernels(registered):
    """The stateless batch kernels run verbatim on the streamed corpus:
    streaming segments == batch segments over the same options."""
    import tempfile

    from cosmos_spark import pipeline as P

    spark = registered
    batch = (spark.read.format("cosmos_corpus")
             .options(**OPTS, num_partitions="2").load())
    exp_segs = P.segments_of(batch)
    cols = exp_segs.columns
    exp = sorted(map(tuple, exp_segs.collect()))

    stream = (spark.readStream.format("cosmos_corpus")
              .options(**OPTS, rows_per_batch="1000").load())
    segs = P.segments_of(stream)
    ck = tempfile.mkdtemp(prefix="corpus_seg_ck_")
    out = tempfile.mkdtemp(prefix="corpus_seg_out_")
    q = (segs.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out).select(cols).collect()))
    assert got == exp


def test_reader_rejects_reordered_schema(spark):
    """Review fix: rows are synthesized positionally, so a user schema
    that reorders columns would silently misassign values — refused."""
    import pytest as _pt
    df = (spark.read.format("cosmos_corpus")
          .schema("path string, repo string, commit string, lang string, "
                  "content string")
          .option("files_per_repo", "2").load())
    with _pt.raises(Exception, match="positionally"):
        df.collect()
