"""Partition-count determinism check.

The driver's correctness gate hashes exact result VALUES, so any
query whose float bits depend on partition count / merge order would
pass on one machine config and fail on another. This tool prints an
order-insensitive md5 per catalog query; run it twice with different
parallelism and diff:

    python tools/determinism_check.py > /tmp/det_32.json
    SPARK_GRAFT_CPUS=7 SPARK_GRAFT_SHUFFLE_PARTITIONS=5 \
        python tools/determinism_check.py > /tmp/det_5.json
    python - <<'PY'
    import json
    a = json.load(open('/tmp/det_32.json')); b = json.load(open('/tmp/det_5.json'))
    diff = {k: (a[k], b[k]) for k in a if a.get(k) != b.get(k)}
    print(json.dumps(diff, indent=1) if diff else 'DETERMINISTIC')
    PY

Queries engineered for bit-stability (integer-milli means, cents
sums, quantized rolling means) should hash identically; a mismatch
here is a latent gate failure on a differently-sized cluster.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def norm_cell(v):
    if v is None:
        return "None"
    if isinstance(v, float):
        return repr(v)  # full bits — this is a BIT-stability check
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v)) + "}"
    return repr(v)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from ngafid_cpat_spark.plans import QUERIES
    from ngafid_cpat_spark.session import get_spark

    spark = get_spark("determinism-check")
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[1:] or list(QUERIES)
    out = {}
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            cols = sorted(df.columns)
            rows = sorted(
                "|".join(norm_cell(r[c]) for c in cols) for r in df.collect()
            )
            out[name] = hashlib.md5("\n".join(rows).encode()).hexdigest()[:16]
        except Exception as e:  # noqa: BLE001
            out[name] = f"err:{type(e).__name__}"
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
