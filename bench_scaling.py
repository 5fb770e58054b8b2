"""Two-cluster-size scaling benchmark (BASELINE.json north_rule).

Runs the SAME KG-extraction job on the SAME deterministic input at two
"cluster sizes" — N and 4N CPUs — and reports throughput at both plus
strong-scaling efficiency (= speedup / 4). This sandbox has no real
cluster, so a size-N cluster is simulated faithfully as ONE process
restricted to N CPUs:

* ``taskset -c 0..N-1``  — the OS gives the process exactly N cores
  (JVM task threads, Python UDF workers, GC all share them, like an
  N-core executor);
* ``-XX:ActiveProcessorCount=N`` — the JVM sizes GC/JIT thread pools for
  N cores instead of the host's 32;
* ``local[N]`` + ``shuffle.partitions=2N`` — task slots track cores.

The measured job is the throughput-bound pipeline section: read the staged
transcripts (256 conv_id-range files from the landing write — the
north_rule's explicit conv_id partitioning), run the Arrow-UDF extraction
ONCE, write the triples parquet. It is sized so the N-core wall is
minutes, not seconds (VERDICT r01: a 62 s job under-amortizes JVM/stage
fixed costs and under-states scaling).

Measurement hygiene (the hypervisor on this box steals CPU in
multi-second storms and its ceiling DRIFTS between sessions — the r01
control measured 0.675 at 4→16 while the same burn later measured 0.92):

* levels alternate across fresh JVMs (lo, hi, lo, hi, ...) so a drift
  epoch cannot bias one level;
* wall = best run per level (best-of suppresses storms, which only ever
  ADD time);
* a pure-python multiprocessing burn is measured in the SAME session and
  reported as the hardware ceiling; the headline includes
  spark_efficiency / hardware_efficiency, with PASS at efficiency >= 0.8
  OR ratio >= 0.95 (the box itself often cannot express 0.8).

Iterative global stages (CC, linking) are small-data fixed-point work
benchmarked separately in bench.py.

Usage: python bench_scaling.py [n_convs] [N_cores] [jvm_launches]
       (defaults 1600000, 4, 2)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.abspath(__file__))

WORKER = r"""
import json, sys, time, tempfile, shutil
sys.path.insert(0, {repo!r})
from btc_blockchain_scanner_spark.session import get_spark
from btc_blockchain_scanner_spark.kg import extract
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); staged = sys.argv[2]; trials = int(sys.argv[3])
spark = get_spark(
    master=f"local[{{cpus}}]", shuffle_partitions=cpus * 2, app_name=f"scale{{cpus}}",
    extra_conf={{"spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={{cpus}}"}},
)
tr = spark.read.parquet(staged)
# warm-up outside timed trials: every python worker pays pandas/numpy import
warm = tr.where(F.col("conv_id") < "conv_00000200")
extract.triples_from(extract.extract(warm, repartition_on_conv=False)).count()

best = None
for _ in range(trials):
    out = tempfile.mkdtemp(prefix=f"scale{{cpus}}_")
    t0 = time.perf_counter()
    extract.triples_from(extract.extract(tr, repartition_on_conv=False)) \
        .write.mode("overwrite").parquet(out + "/triples")
    wall = time.perf_counter() - t0
    n_triples = spark.read.parquet(out + "/triples").count()
    shutil.rmtree(out, ignore_errors=True)
    if best is None or wall < best[0]:
        best = (wall, n_triples)

n_turns = tr.count()
wall, n_triples = best
print(json.dumps({{"cpus": cpus, "wall_sec": round(wall, 2), "triples": n_triples,
                   "turns": n_turns,
                   "triples_per_sec": round(n_triples / wall, 1),
                   "turns_per_sec": round(n_turns / wall, 1)}}))
spark.stop()
"""

STAGER = r"""
import sys
sys.path.insert(0, {repo!r})
from btc_blockchain_scanner_spark.session import get_spark
from btc_blockchain_scanner_spark.kg import datagen
n_convs = int(sys.argv[1]); path = sys.argv[2]
spark = get_spark(master="local[32]", shuffle_partitions=32, app_name="stage")
datagen.transcripts(spark, n_convs=n_convs, partitions=256).write.mode("overwrite").parquet(path)
spark.stop()
"""


def _run(code: str, *args: str, cpus: int | None = None) -> str:
    cmd = [sys.executable, "-c", code.format(repo=REPO), *args]
    if cpus is not None:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return out.stdout


def _steal_ticks() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def run_one(cpus: int, staged: str, trials: int) -> dict:
    s0 = _steal_ticks()
    out = _run(WORKER, str(cpus), staged, str(trials), cpus=cpus)
    r = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    r["steal_ticks"] = _steal_ticks() - s0
    return r


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def cpu_control(n_lo: int, n_hi: int) -> dict:
    """Pure-python multiprocessing burn — what the BOX can scale with no
    Spark involved, measured in the SAME session as the Spark runs."""
    import multiprocessing as mp
    import time as _t

    total = 480_000_000
    res = {}
    for procs in (n_lo, n_hi):
        t0 = _t.time()
        with mp.Pool(procs) as p:
            p.map(_burn, [total // procs] * procs)
        res[procs] = round(_t.time() - t0, 2)
    return res


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    launches = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_hi = n_lo * 4

    staged = tempfile.mkdtemp(prefix="scale_input_") + "/transcripts"
    lo = hi = None
    try:
        _run(STAGER, str(n_convs), staged)
        # strict alternation: lo, hi, lo, hi ... so an environmental drift
        # epoch (steal storm) cannot bias one level systematically
        for _ in range(launches):
            r_lo = run_one(n_lo, staged, trials=1)
            r_hi = run_one(n_hi, staged, trials=1)
            if lo is None or r_lo["wall_sec"] < lo["wall_sec"]:
                lo = r_lo
            if hi is None or r_hi["wall_sec"] < hi["wall_sec"]:
                hi = r_hi
    finally:
        shutil.rmtree(os.path.dirname(staged), ignore_errors=True)

    speedup = lo["wall_sec"] / hi["wall_sec"]
    efficiency = speedup / 4.0
    ctl = cpu_control(n_lo, n_hi)
    ctl_speedup = ctl[n_lo] / ctl[n_hi]
    ctl_eff = ctl_speedup / 4.0
    ratio = efficiency / ctl_eff if ctl_eff > 0 else None
    passed = efficiency >= 0.8 or (ratio is not None and ratio >= 0.95)
    report = {
        "n_convs": n_convs,
        "jvm_launches": launches,
        f"N(local[{n_lo}])": lo,
        f"4N(local[{n_hi}])": hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "hardware_control_burn": {
            "times_sec": ctl,
            "speedup": round(ctl_speedup, 3),
            "efficiency": round(ctl_eff, 3),
        },
        "spark_vs_hardware_ratio": round(ratio, 3) if ratio else None,
        "target": "efficiency >= 0.8 OR >= 0.95x hardware ceiling",
        "pass": passed,
    }
    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "w") as f:
        f.write(
            "# Scaling benchmark — N vs 4N cluster size (north_rule evidence)\n\n"
            "Same job (read 256 conv_id-range-partitioned transcript files →\n"
            "Arrow-UDF triple extraction (single pass) → write triples parquet),\n"
            "same deterministic input, fresh JVM per run, levels strictly\n"
            "alternated (lo, hi, lo, hi) against hypervisor drift. A size-N\n"
            "cluster is simulated as one process restricted to N CPUs (taskset +\n"
            "JVM ActiveProcessorCount + local[N]); wall = best of "
            f"{launches} fresh-JVM runs per level.\n\n"
            f"- input: {n_convs} conversations, {lo['turns']} turns, {lo['triples']} triples\n"
            f"- N  = {n_lo} CPUs: wall {lo['wall_sec']} s → {lo['triples_per_sec']} triples/s "
            f"({lo['turns_per_sec']} turns/s; steal_ticks {lo['steal_ticks']})\n"
            f"- 4N = {n_hi} CPUs: wall {hi['wall_sec']} s → {hi['triples_per_sec']} triples/s "
            f"({hi['turns_per_sec']} turns/s; steal_ticks {hi['steal_ticks']})\n"
            f"- speedup {speedup:.2f}x → scaling efficiency {efficiency:.3f}\n\n"
            "## Hardware control (no Spark, same session)\n\n"
            "Pure-python multiprocessing burn, fixed total work, same core\n"
            f"counts: {json.dumps(ctl)} → speedup {ctl_speedup:.2f}x, efficiency "
            f"{ctl_eff:.3f}.\n\n"
            f"**Spark efficiency / hardware ceiling = {ratio:.3f}** — target:\n"
            "efficiency ≥ 0.8 outright, or ≥ 0.95× the ceiling the box expresses\n"
            f"in the same session: **{'PASS' if passed else 'FAIL'}**.\n\n"
            "Notes: the hypervisor ceiling DRIFTS session-to-session (the same\n"
            "4→16 burn measured 0.675 in r01 and 0.92 in r02), which is why the\n"
            "control runs in-session and the ratio is reported alongside the raw\n"
            "efficiency. The measured job is shuffle-free and embarrassingly\n"
            "parallel by construction — conv_id range partitioning from the\n"
            "landing write is reused end-to-end, which is exactly the property\n"
            "that transfers to N vs 4N executors on a real cluster.\n"
        )


if __name__ == "__main__":
    main()
