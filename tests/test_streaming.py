"""Structured-Streaming incremental passes (Trigger.AvailableNow) —
the NumberFile-checkpoint analog (SURVEY.md §2.8)."""

from btc_blockchain_scanner_spark.kg import datagen, extract
from btc_blockchain_scanner_spark.streaming import incremental_extract
from btc_blockchain_scanner_spark.streaming.incremental import loop_incremental_extract


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


def test_loop_stops_on_stop_file_handshake(spark, tmp_path):
    """--loop + stop-file graceful shutdown (RunFullScan.java:150-157,
    506-513): loop drains available data each iteration, stops when the
    stop file appears, and renames it to .done as the acknowledgement."""
    import os

    inp, outp, ckpt = (str(tmp_path / d) for d in ("landing", "out", "ckpt"))
    stop = str(tmp_path / "stop")
    datagen.transcripts(spark, n_convs=5).write.mode("append").parquet(inp)

    # bounded loop with no stop file: runs max_loops drains, output stable
    loops = loop_incremental_extract(spark, inp, outp, ckpt, stop_file=stop, max_loops=2)
    assert loops == 2
    n = spark.read.parquet(outp).count()
    assert n > 0

    # stop file present: loop exits BEFORE draining and acknowledges
    open(stop, "w").close()
    loops = loop_incremental_extract(spark, inp, outp, ckpt, stop_file=stop, max_loops=5)
    assert loops == 0
    assert not os.path.exists(stop) and os.path.exists(stop + ".done")
    assert spark.read.parquet(outp).count() == n
