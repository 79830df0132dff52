#!/usr/bin/env python3
"""One-command gate for the whole Python surface: runs every python test
script through spark-submit with the compiled graft classes on the driver
classpath, and exits non-zero if any suite fails — so graft_db /
graft_langchain / graft_llamaindex regressions cannot land silently.

    python3 python/run_all.py            # from the repo root
    python3 python/run_all.py --quick    # only the client suite

PySparkSpec drives this from ScalaTest (sbt test) when spark-submit is
available.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
SUITES = ["test_graft_db.py", "test_graft_langchain.py"]


def main() -> int:
    spark_submit = os.environ.get("SPARK_SUBMIT", "spark-submit")
    classes = os.path.join(ROOT, "target", "scala-2.13", "classes")
    if not os.path.isdir(classes):
        print(f"FATAL: compiled classes not found at {classes}; "
              "run `sbt compile` first", file=sys.stderr)
        return 2
    suites = SUITES[:1] if "--quick" in sys.argv else SUITES
    failed = []
    for suite in suites:
        print(f"=== {suite}", flush=True)
        proc = subprocess.run(
            [spark_submit, "--driver-class-path", classes,
             os.path.join(HERE, suite)],
            cwd=ROOT)
        if proc.returncode != 0:
            failed.append(suite)
        print(f"=== {suite}: "
              f"{'FAIL' if proc.returncode else 'PASS'}", flush=True)
    if failed:
        print(f"FAILED: {', '.join(failed)}", file=sys.stderr)
        return 1
    print(f"all {len(suites)} python suites passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
