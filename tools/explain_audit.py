"""Physical-plan audit: dump .explain("formatted") for every catalog
query and grep for the scale-critical properties:

  * PushedFilters reaching the parquet scan
  * pruned ReadSchema (no over-fetch)
  * BroadcastHashJoin where a dim is joined (no accidental SMJ/BNLJ
    on dimension joins)
  * WholeStageCodegen coverage
  * Exchange (shuffle) count per query

Writes PLANS.md with a summary table + flagged issues.

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, plan: str) -> dict:
    return {
        "name": name,
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "codegen": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "pushed": len(re.findall(r"PushedFilters: \[(?!\])", plan)),
        "python_udf": len(re.findall(r"(?:BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
    }


def main() -> None:
    from ngafid_cpat_spark.plans import QUERIES
    from ngafid_cpat_spark.session import get_spark

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # AQE wraps plans in a lazy AdaptiveSparkPlan that hides
    # WholeStageCodegen spans until execution; audit the static plan
    # (runtime plans only get better — AQE coalesces/upgrades joins)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    names = sys.argv[1:] or list(QUERIES)
    rows = []
    issues = []
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            a = audit(name, plan_of(df))
        except Exception as e:  # pragma: no cover
            issues.append(f"- `{name}`: explain failed: {e}")
            continue
        rows.append(a)
        # SMJ is correct for fact-fact joins; flag only unexpected ones
        expected_smj = {
            "join_outer_nation_counts",  # full outer: no broadcast strategy exists
            "approach_pipeline_demo",    # fact-fact joins on (flight,time)
            # two-phase argmin: phase 2 joins the facts with their own
            # fact-sized min(distance) table — correctly SMJ, a
            # broadcast there would ship |facts| rows to every executor
            "nn_join_acctbal",
            # connected components: label/edge joins are node-sized on
            # both sides (dup-graph scale, not dim scale)
            "dedup_clusters",
            # triangle counting: degree/wedge/closing joins are all
            # edge-sized on both sides — broadcasting an O(m) edge set
            # would ship the whole graph to every executor; SMJ (or
            # AQE's runtime BHJ at small SF) is the correct shape
            "triangle_counts_events",
            # PageRank: every iteration joins edges with the node-
            # sized rank table and re-aggregates per node — both
            # sides are graph-scale (edges O(m), ranks O(n)), so SMJ
            # is the correct static shape at 100 TB; AQE converts to
            # BHJ at small SF. The scored survivorship's components
            # inherit dedup_clusters' node-sized joins.
            "pagerank_events",
            "dedup_keep_best_scored",
            # personalized PageRank: same 12 fact-fact SMJs as the
            # classic plan; the personalization's own joins ARE
            # broadcast (seed flag BHJ, one-row scalar BNLJ) — see
            # PLANS_APPENDIX disposition
            "personalized_pagerank_events",
            # sorted-neighborhood blocking: record-to-record joins on
            # the global rid (both sides corpus-sized; broadcasting
            # the numbered corpus is the single-node trap SNM avoids)
            "snm_blocking_pairs_customers",
        }
        if a["smj"] and name not in expected_smj:
            issues.append(
                f"- `{name}`: {a['smj']} SortMergeJoin(s) — check whether the side is a broadcastable dim"
            )
        # deliberate Arrow-batched Python stages (documented in the
        # operators): multimodal decode has no JVM codec; the
        # embedding pair scorers run one numpy matmul per bucket
        # group (operators/similarity.cosine_pairs_in_groups) — the
        # expression-API form was measured ~20x slower. Anything ELSE
        # showing Python eval is an unintentional hot-path UDF.
        intended_pandas = {
            "multimodal_meta",
            "embedding_neardup_pairs",
            "embedding_neardup_lsh",
            # SemDeDup within-cluster pairing reuses the same blocked
            # numpy matmul (cosine_pairs_in_groups) grouped by the
            # kmeans cell id
            "semantic_dedup_embeddings",
        }
        if a["python_udf"] and name not in intended_pandas:
            issues.append(f"- `{name}`: Python eval in the plan (UDF in hot path?)")

    with open("/root/repo/PLANS.md", "w") as f:
        f.write(
            "# PLANS — physical-plan audit (sf0.01; static plans, AQE "
            "disabled for the audit so codegen spans are visible — the "
            "engine itself runs with AQE on)\n\n"
        )
        f.write(
            "Auto-generated by tools/explain_audit.py. Columns: shuffles "
            "(Exchange), broadcast hash joins, sort-merge joins, broadcast "
            "nested-loop joins, WholeStageCodegen spans, scans with pushed "
            "filters, parquet scans, Python-eval nodes.\n\n"
        )
        f.write("| query | xchg | BHJ | SMJ | BNLJ | codegen | pushed | scans | pyUDF |\n")
        f.write("|---|---|---|---|---|---|---|---|---|\n")
        for a in rows:
            f.write(
                f"| {a['name']} | {a['exchanges']} | {a['bhj']} | {a['smj']} | "
                f"{a['bnlj']} | {a['codegen']} | {a['pushed']} | {a['scans']} | {a['python_udf']} |\n"
            )
        f.write("\n## Flags\n\n")
        f.write("\n".join(issues) if issues else "(none)")
        f.write("\n")
        # durable hand-maintained sections (e.g. the dedup stage
        # profile from tools/stage_profile.py) survive regeneration
        try:
            with open("/root/repo/PLANS_APPENDIX.md") as apx:
                f.write("\n" + apx.read())
        except FileNotFoundError:
            pass
    print(f"wrote PLANS.md ({len(rows)} queries, {len(issues)} flags)")
    for i in issues:
        print(i)


if __name__ == "__main__":
    main()
