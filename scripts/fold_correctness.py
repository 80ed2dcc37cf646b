#!/usr/bin/env python3
"""Fold a subset CORRECTNESS artifact (check_oracle.py --json output)
into a cumulative one: rows present in the subset REPLACE the same-name
rows in the target; everything else is untouched. _meta is left for the
caller to edit (it narrates scope/provenance, which a blind merge
cannot).

Usage: fold_correctness.py <target.json> <subset.json>
"""
import json
import sys


def main(target_path, subset_path):
    target = json.load(open(target_path))
    subset = json.load(open(subset_path))
    rows = subset.get("queries", subset)
    merged = 0
    for name, row in rows.items():
        if name == "_meta":
            continue
        target.setdefault("queries", {})[name] = row
        merged += 1
    with open(target_path, "w") as f:
        json.dump(target, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"folded {merged} rows into {target_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
