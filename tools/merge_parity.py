"""Fold a key-subset parity artifact (a SPARK_GRAFT_PARITY_KEYS rerun
with a larger per-key budget) into a full-sweep artifact: subset
records replace the full sweep's records for those keys and the
summary is recomputed, so the merged file is the single evidence
object the round's verdict reads.

Usage: python tools/merge_parity.py FULL.json SUBSET.json [OUT.json]
(OUT defaults to FULL.json, in place.)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    full_p, sub_p = Path(sys.argv[1]), Path(sys.argv[2])
    out_p = Path(sys.argv[3]) if len(sys.argv) > 3 else full_p

    from b2b_data_pipeline_indiamart_spark.plans import ORACLE

    full = json.loads(full_p.read_text())
    sub = json.loads(sub_p.read_text())
    merged = dict(full["keys"])
    for key, rec in sub["keys"].items():
        rec = dict(rec)
        rec["merged_from"] = sub_p.name
        merged[key] = rec

    oracle_keys = [k for k in merged if k in ORACLE]
    summary = {
        "sf_dir": full["summary"].get("sf_dir"),
        "elapsed_sec": round(
            full["summary"].get("elapsed_sec", 0)
            + sub["summary"].get("elapsed_sec", 0), 1,
        ),
        "total_keys": len(merged),
        "oracle_keys": len(oracle_keys),
        "hash_pass": sum(1 for k in oracle_keys if merged[k]["hash_match"]),
        "rows_only": len(merged) - len(oracle_keys),
        "rows_only_deterministic": sum(
            1 for k in merged
            if merged[k].get("err") == "no_oracle"
            and merged[k].get("deterministic")
        ),
        "budget_skipped": sum(
            1 for k in merged
            if (merged[k].get("err") or "").startswith("key_budget_exceeded")
        ),
        "merged_subset": sorted(sub["keys"]),
    }
    out_p.write_text(json.dumps({"summary": summary, "keys": merged},
                                indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
