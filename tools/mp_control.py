"""Ideal-parallel (no Spark) control for the scaling benchmark.

Runs the SAME extraction work (same parquet input, same _extract_one
semantics) as plain multiprocessing with a perfect static file split —
the best any engine could do on this machine. If Spark's N→4N efficiency
matches this control's, the engine adds no scaling bottleneck; the gap to
1.0 is the host (memory bandwidth / hypervisor throttling).

Usage: python tools/mp_control.py <staged_transcripts_dir> [procs ...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def work(args):
    flist, outdir = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    from btc_blockchain_scanner_spark.kg.extract import _extract_one

    n_triples = 0
    out_rows = {"conv_id": [], "turn_idx": [], "subj": [], "pred": [], "obj": []}
    for f in flist:
        t = pq.read_table(f, columns=["conv_id", "turn_idx", "text"])
        for conv, ti, text in zip(
            t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(), t["text"].to_pylist()
        ):
            _ms, ts = _extract_one(text)
            for s, p, o, _pos in ts:
                out_rows["conv_id"].append(conv)
                out_rows["turn_idx"].append(ti)
                out_rows["subj"].append(s)
                out_rows["pred"].append(p)
                out_rows["obj"].append(o)
            n_triples += len(ts)
    pq.write_table(pa.table(out_rows), os.path.join(outdir, f"t_{os.getpid()}.parquet"))
    return n_triples


def run(staged: str, procs: int) -> dict:
    files = sorted(
        os.path.join(staged, f) for f in os.listdir(staged) if f.endswith(".parquet")
    )
    chunks = [files[i::procs] for i in range(procs)]
    outdir = tempfile.mkdtemp(prefix=f"mpctl{procs}_")
    t0 = time.time()
    ctx = mp.get_context("fork")
    with ctx.Pool(procs) as p:
        res = p.map(work, [(c, outdir) for c in chunks])
    dt = time.time() - t0
    import shutil

    shutil.rmtree(outdir, ignore_errors=True)
    return {"procs": procs, "wall_sec": round(dt, 2), "triples": sum(res),
            "triples_per_sec": round(sum(res) / dt, 1)}


def main() -> None:
    staged = sys.argv[1]
    levels = [int(x) for x in sys.argv[2:]] or [2, 8]
    results = [run(staged, p) for p in levels]
    print(json.dumps(results))
    if len(results) == 2:
        sp = results[0]["wall_sec"] / results[1]["wall_sec"]
        ratio = levels[1] / levels[0]
        print(json.dumps({"speedup": round(sp, 3), "efficiency": round(sp / ratio, 3)}))


if __name__ == "__main__":
    main()
