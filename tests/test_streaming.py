"""Structured-Streaming incremental passes (Trigger.AvailableNow) —
the NumberFile-checkpoint analog (SURVEY.md §2.8)."""

from btc_blockchain_scanner_spark.kg import datagen, extract
from btc_blockchain_scanner_spark.streaming import incremental_extract


def test_incremental_extract_resumes_from_checkpoint(spark, tmp_path):
    inp = str(tmp_path / "landing")
    outp = str(tmp_path / "mentions")
    ckpt = str(tmp_path / "ckpt")

    batch1 = datagen.transcripts(spark, n_convs=8)
    batch1.write.mode("append").parquet(inp)
    incremental_extract(spark, inp, outp, ckpt)
    n1 = spark.read.parquet(outp).count()
    assert n1 > 0

    # re-running with no new data adds nothing (checkpoint watermark)
    incremental_extract(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == n1

    # new files are picked up incrementally
    batch2 = datagen.transcripts(spark, n_convs=16, seed=43).where("conv_id >= 'conv_00000008'")
    batch2.write.mode("append").parquet(inp)
    incremental_extract(spark, inp, outp, ckpt)
    n2 = spark.read.parquet(outp).count()
    assert n2 > n1

    # streamed extraction == batch extraction over the same landing data
    batch_equiv = extract.mentions_from(
        extract.extract(spark.read.parquet(inp), repartition_on_conv=False)
    )
    assert n2 == batch_equiv.count()
