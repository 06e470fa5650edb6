"""Steady-state job-count + plan dump for one registered query — the
generator for the committed `plans/r*/<query>_{before,after}.txt` evidence
files (r15 produced them ad hoc; this pins the methodology).

Usage: python tools/jobdump.py <query> [sf_dir] [label] > plans/rNN/<query>_<label>.txt

Methodology (bench.py's, so job counts line up with bench timings):
- pass 1 (untimed): absorbs one-time fixture/index builds + JIT warmup;
- pass 2 (reported): wall time and a dagScheduler nextJobId() diff — the
  job count covers EVERYTHING the query ran (micro-batch drains included),
  which is the contention-immune fixed-cost metric for store-backed ops;
- pass 3 (untimed): `.explain('formatted')` of the returned DataFrame with
  AQE off so the plan prints resolved (tools/explain_audit.py convention).
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_apache_iceberg_workshop_spark.plans.registry import registry  # noqa: E402
from emr_apache_iceberg_workshop_spark.session import build_session  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    label = sys.argv[3] if len(sys.argv) > 3 else "after"
    spec = registry()[name]

    spark = build_session(
        "eiws-jobdump",
        extra_confs={"spark.sql.streaming.stateStore.maintenanceInterval": "2h"},
    )
    sc = spark.sparkContext

    def next_job_id() -> int:
        # py4j auto-unboxes the AtomicInteger's value on this build
        jid = sc._jsc.sc().dagScheduler().nextJobId()
        return jid if isinstance(jid, int) else jid.get()

    # pass 1: fixture build + warmup (bench.py does the same, untimed)
    t0 = time.time()
    spec.fn(spark, sf_dir).count()
    cold = time.time() - t0
    spark.catalog.clearCache()

    # pass 2: steady state, job-count diff
    j0 = next_job_id()
    t0 = time.time()
    n = spec.fn(spark, sf_dir).count()
    wall = time.time() - t0
    jobs = next_job_id() - j0
    spark.catalog.clearCache()

    # pass 3: formatted plan, AQE off so it prints resolved
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    df = spec.fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    print(f"# {name} — {label} (sf_dir={sf_dir})")
    print(
        f"# steady-state run (pass 2, bench.py methodology): {wall:.2f}s wall,"
        f" {jobs} Spark jobs, {n} rows (pass 1 cold: {cold:.2f}s)"
    )
    print("# plan: .explain('formatted') of the returned DataFrame, AQE off")
    print("# (third, untimed build; store-backed queries scan the store the")
    print("#  steady-state run maintained)")
    print()
    print(buf.getvalue())
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
