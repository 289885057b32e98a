"""Capture .explain("formatted") for catalog queries into plans/
$SPARK_GRAFT_PLANS_DIR (default r15; r14 dumps are kept committed).

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name suffix)
  with no query list: every non-streaming catalog query (streaming
  queries execute a real micro-batch run at plan-build time, so they
  are captured only when explicitly named).
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_DIR", "r15"),
)


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from ngafid_cpat_spark.plans import QUERIES
    from ngafid_cpat_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    if not names:
        names = [n for n in sorted(QUERIES) if not n.startswith("streaming_")]
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
                f.write(f"# {name} @ {SF_DIR}\n")
                f.write(buf.getvalue())
            print("ok", name)
        except Exception as e:
            print("ERR", name, type(e).__name__, str(e)[:120])


if __name__ == "__main__":
    main()
